"""Monolithic fused GNT transformer, v4 — 128-lane sample-pair packing.

mono3's tensors are all 64 channels wide (GNT netwidth), but the TPU's
native tile is 128 lanes (VPU 8x128, MXU 128x128, bf16 min tile (16, 128)):
every elementwise pass and every matmul of mono3 runs at <=50% lane
utilization, and the bottleneck attn_fc matmuls ([*, 64] x [64, 8]) at
~6%. With the device confirmed at nominal v5e rate (189 TFLOP/s traced —
scripts/profile_render_trace.py), this layout waste IS the kernel's cost.

mono4 packs PAIRS OF CONSECUTIVE SAMPLES into the lane dimension:

  token tensor [v*r*s, 64]  ->  [v*r*s/2, 128],  lanes = [even_tok | odd_tok]

which is FREE at the input boundary (the sampler's [V, R, S, C] row-major
layout regroups to [V, R, S/2, 2C] without data movement). Consequences:

  * every dense layer becomes a block-diagonal matmul
    [n/2, 128] x [128, 128-or-wider] — full MXU contraction depth, half the
    row passes (weights are rearranged once at flatten time, in f32);
  * every elementwise/softmax pass runs on full 128-lane tiles at half the
    rows — ~2x VPU throughput;
  * layernorm stats (per-64-lane-half mean/var) are computed with ONE
    [128, 128] block-diagonal averaging matmul (Sel) instead of VPU lane
    reductions — the MXU is idle there anyway;
  * the cross-view softmax is untouched: the view axis lives in sublanes,
    so per-view max/exp/fma slices work identically on packed rows;
  * ray attention needs true sample-major tokens, so each block unpacks
    q to an EVENS-THEN-ODDS sequence ([r, s, 64]) — attention is
    permutation-equivariant, so running it on the reordered sequence is
    exact; the per-sample weights output is emitted in that order and
    un-permuted once, XLA-side, per ray tile.

Folds: mono4 always runs the full bench fold set (fold_ray_diff +
fold_pos_code + fold_mask): ray-diff, the pts sinusoidal embedding and the
inbound validity are all computed in VMEM from a packed [r, s/2, 6] pts
stream. The dyn-mask/eval paths stay on mono3.

Numerics: identical op set and dtypes to mono3 (bf16 matmuls, f32
layernorm stats / view+ray softmax) — only the lane layout and the
evens-odds ray-attention order differ; parity is bf16-rounding bounded
(tests/test_gnt_fused.py).

Reference behavior anchor: transformer_network.py:341-539.
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NW = 64
NP = 128  # packed width = 2 * NW
DEPTH = 8
HEADS = 4
POSENC = 63
NEG = -1e30
PH = 8  # attn/pos bottleneck hidden width (netwidth // 8)
# log2(e): both softmaxes fold this into their logit weights OFFLINE so the
# kernel exponentiates with the VPU-native exp2 (exp(x) == exp2(x*log2e);
# softmax is invariant to the consistent scale, so the math is exact) —
# saves one VPU multiply per logit element per view/key.
LOG2E = 1.4426950408889634


def _d2(w):
    """Block-diagonal pair duplication: [i, o] -> [2i, 2o]."""
    w = jnp.asarray(w, jnp.float32)
    i, o = w.shape
    z = jnp.zeros((i, o), jnp.float32)
    return jnp.concatenate(
        [
            jnp.concatenate([w, z], axis=1),
            jnp.concatenate([z, w], axis=1),
        ],
        axis=0,
    )


def _t2(b):
    """Bias pair duplication: [o] -> [2o]."""
    b = jnp.asarray(b, jnp.float32)
    return jnp.concatenate([b, b], axis=0)


def _pts_lane_perm() -> np.ndarray:
    """Packed pts-embedding lane -> token embedding dim.

    The in-kernel octave ladder concatenates [xyz, sin, cos, ...] pieces of
    the PACKED [*, 6] pts tensor, so lanes come in 6-groups of
    [e_dim3 | o_dim3]. perm[lane] = (token_dim, is_odd)."""
    lanes = []
    for g in range(1 + 2 * 10):  # xyz + 10 (sin, cos) octaves
        for half in range(2):
            for w in range(3):
                lanes.append((g * 3 + w, half))
    return np.asarray(lanes, np.int32)  # [126, 2]


def flatten_gnt_params_mono4(
    gnt_params, patch_combine: bool = False, n_pos: int = 16
) -> List[jnp.ndarray]:
    """Flax GNT params -> mono4 packed weight list (see module docstring).

    patch_combine: emit rgbfeat_fc_0 TILED n_pos times along rows
    ([n_pos*C, NW]) so the in-kernel patch combine's position-reduce matmul
    and the first rgbfeat projection are ONE matmul:
    (rows * coef_exp) @ tile(W0) == (sum_p rows_p * coef_p) @ W0 by
    linearity.
    """
    p = gnt_params["params"]
    bp = p["block_pairs"]

    def get(slot_blk, *path):
        pair, _slot = divmod(slot_blk, 2)
        cur = bp
        for k in path:
            cur = cur[k]
        return jnp.asarray(cur[pair], jnp.float32)

    def vt(blk):
        return f"view_trans_{'ab'[blk % 2]}"

    def rt(blk):
        return f"ray_trans_{'ab'[blk % 2]}"

    # ---- cross-block precompute weights, block-major paired lanes -------
    # Attention-chain composition (round 4): the k projection's ONLY
    # consumer is attn_fc_0's bottleneck (k - q + pos) @ w_a0, and w_a0 is
    # linear — so wk@w_a0, wq@w_a0 and p1@w_a0 are composed OFFLINE and the
    # kernel never materializes kp nor runs a per-block a0 pass: the
    # full-width kp matmul (1 MXU pass/block over all view tokens) and the
    # a0 pass (another) collapse into ONE [128, 128] matmul for ALL 8
    # blocks on each of the h / pos_in sides. Saves 2 of the 5 per-block
    # view-token MXU passes (measured: the fused kernel is MXU-pass bound).
    ka0_cat, wkv_cat, p0_cat, b0_cat, b1_cat, ca0_cat = [], [], [], [], [], []
    wa0_by_blk = []
    p1_bd = jnp.zeros((DEPTH * 2 * PH, DEPTH * NP), jnp.float32)
    pa0_bd = jnp.zeros((DEPTH * 2 * PH, DEPTH * 2 * PH), jnp.float32)
    for blk in range(DEPTH):
        wk = get(blk, vt(blk), "attn", "k_fc", "kernel")
        wv = get(blk, vt(blk), "attn", "v_fc", "kernel")
        wa0 = get(blk, vt(blk), "attn", "attn_fc_0", "kernel")  # [NW, PH]
        ba0 = get(blk, vt(blk), "attn", "attn_fc_0", "bias")
        wa0_by_blk.append(wa0)
        ka0_cat.append(_d2(wk @ wa0))             # [128, 2*PH]
        wkv_cat.append(_d2(wk @ wv))
        p0_cat.append(_d2(get(blk, vt(blk), "attn", "pos_fc_0", "kernel")))
        b0_cat.append(_t2(get(blk, vt(blk), "attn", "pos_fc_0", "bias")))
        p1 = get(blk, vt(blk), "attn", "pos_fc_1", "kernel")  # [PH, NW]
        b1 = get(blk, vt(blk), "attn", "pos_fc_1", "bias")
        r0 = blk * 2 * PH
        c0 = blk * NP
        p1_bd = p1_bd.at[r0 : r0 + PH, c0 : c0 + NW].set(p1)
        p1_bd = p1_bd.at[r0 + PH : r0 + 2 * PH, c0 + NW : c0 + NP].set(p1)
        b1_cat.append(_t2(b1))
        p1a0 = p1 @ wa0                           # [PH, PH]
        pa0_bd = pa0_bd.at[r0 : r0 + PH, r0 : r0 + PH].set(p1a0)
        pa0_bd = pa0_bd.at[r0 + PH : r0 + 2 * PH, r0 + PH : r0 + 2 * PH].set(
            p1a0
        )
        ca0_cat.append(_t2(b1 @ wa0 + ba0))       # [2*PH]

    w0 = jnp.asarray(p["rgbfeat_fc_0"]["kernel"], jnp.float32)  # [C, NW]
    out = [
        jnp.concatenate([w0] * n_pos, axis=0) if patch_combine else _d2(w0),
        _t2(p["rgbfeat_fc_0"]["bias"]),
        _d2(p["rgbfeat_fc_1"]["kernel"]),
        _t2(p["rgbfeat_fc_1"]["bias"]),
        jnp.concatenate(ka0_cat, axis=1),         # [128, DEPTH*2*PH]
        jnp.concatenate(wkv_cat, axis=1),
        jnp.concatenate(p0_cat, axis=1),          # [8, DEPTH*2*PH]
        jnp.concatenate(b0_cat, axis=0),
        p1_bd,                                    # [DEPTH*2*PH, DEPTH*128]
        jnp.concatenate(b1_cat, axis=0),
        pa0_bd,                                   # [DEPTH*2*PH, DEPTH*2*PH]
        jnp.concatenate(ca0_cat, axis=0),
    ]

    pperm = _pts_lane_perm()
    hd = NW // HEADS
    for blk in range(DEPTH):
        v = vt(blk)
        r = rt(blk)
        # q_fc composed with attn_fc_0, output embedded at this block's
        # 2*PH lane group (columns blk*16..) so the kernel subtracts it
        # from the full-width a0 sum with no lane slicing
        wqa0 = _d2(get(blk, v, "attn", "q_fc", "kernel") @ wa0_by_blk[blk])
        wqa0_emb = jnp.zeros((NP, DEPTH * 2 * PH), jnp.float32)
        wqa0_emb = wqa0_emb.at[:, blk * 2 * PH : (blk + 1) * 2 * PH].set(wqa0)
        # attn_fc_1 lifted to full width: rows outside this block's lane
        # group are zero, so the relu'd garbage lanes of other blocks
        # contribute nothing
        wa1_emb = jnp.zeros((DEPTH * 2 * PH, NP), jnp.float32)
        wa1_emb = wa1_emb.at[blk * 2 * PH : (blk + 1) * 2 * PH, :].set(
            LOG2E * _d2(get(blk, v, "attn", "attn_fc_1", "kernel"))
        )
        out += [
            _t2(get(blk, v, "attn_norm", "scale")),
            _t2(get(blk, v, "attn_norm", "bias")),
            wqa0_emb,
            wa1_emb,
            LOG2E * _t2(get(blk, v, "attn", "attn_fc_1", "bias")),
            _d2(get(blk, v, "attn", "out_fc", "kernel")),
            _t2(get(blk, v, "attn", "out_fc", "bias")),
            _t2(get(blk, v, "ff_norm", "scale")),
            _t2(get(blk, v, "ff_norm", "bias")),
            _d2(get(blk, v, "ff", "fc1", "kernel")),
            _t2(get(blk, v, "ff", "fc1", "bias")),
            _d2(get(blk, v, "ff", "fc2", "kernel")),
            _t2(get(blk, v, "ff", "fc2", "bias")),
        ]
        if blk % 2 == 0:
            # qcat = [q_e(64) | q_o(64) | pts_packed(126) | view_code(63)]
            wq = get(blk, "q_fc_0", "kernel")  # [64 + 126, 64]
            wcat = jnp.zeros((NP + 126 + POSENC, NP), jnp.float32)
            wcat = wcat.at[:NW, :NW].set(wq[:NW])
            wcat = wcat.at[NW:NP, NW:].set(wq[:NW])
            for lane in range(126):
                d, half = int(pperm[lane][0]), int(pperm[lane][1])
                wcat = wcat.at[
                    NP + lane, half * NW : (half + 1) * NW
                ].set(wq[NW + d])
            # the per-ray view embedding is shared by both halves
            wview = wq[NW + POSENC :]  # [63, 64]
            wcat = wcat.at[NP + 126 :, :NW].set(wview)
            wcat = wcat.at[NP + 126 :, NW:].set(wview)
            out += [
                wcat,
                _t2(get(blk, "q_fc_0", "bias")),
                _d2(get(blk, "q_fc_1", "kernel")),
                _t2(get(blk, "q_fc_1", "bias")),
            ]
        # ray attention runs UNPACKED (evens-odds sequence) — original fold
        wq = get(blk, r, "attn", "q_fc", "kernel")
        wkr = get(blk, r, "attn", "k_fc", "kernel")
        wvr = get(blk, r, "attn", "v_fc", "kernel")
        wo = get(blk, r, "attn", "out_fc", "kernel")
        ms, ps = [], []
        for h in range(HEADS):
            sl = slice(h * hd, (h + 1) * hd)
            ms.append(wq[:, sl] @ wkr[:, sl].T * (LOG2E / np.sqrt(hd)))
            ps.append(wvr[:, sl] @ wo[sl, :])
        out += [
            _t2(get(blk, r, "attn_norm", "scale")),
            _t2(get(blk, r, "attn_norm", "bias")),
            jnp.concatenate(ms, axis=1),          # Mcat [64, 256]
            jnp.concatenate(ps, axis=1),          # Pcat [64, 256]
            get(blk, r, "attn", "out_fc", "bias"),
            _t2(get(blk, r, "ff_norm", "scale")),
            _t2(get(blk, r, "ff_norm", "bias")),
            _d2(get(blk, r, "ff", "fc1", "kernel")),
            _t2(get(blk, r, "ff", "fc1", "bias")),
            _d2(get(blk, r, "ff", "fc2", "kernel")),
            _t2(get(blk, r, "ff", "fc2", "bias")),
        ]
    out += [
        _t2(p["norm"]["scale"]),
        _t2(p["norm"]["bias"]),
        jnp.asarray(p["rgb_fc"]["kernel"], jnp.float32),
        jnp.asarray(p["rgb_fc"]["bias"], jnp.float32),
    ]
    return [jnp.asarray(w).astype(jnp.bfloat16) for w in out]


def _gnt_kernel4(
    rb: int,
    s: int,
    v: int,
    feat_in: int,
    fold_mask_hw,
    precompute_kv: bool,
    ablate: str,
    patch_combine: bool,
    s_real: int,
    n_pos: int,
    *refs,
):
    # operand layout (patch_combine=False):
    #   rf_ref      [v, rb, s/2, 2*feat_in] bf16 packed sample pairs
    # operand layout (patch_combine=True), n_pos = patch fy*fx:
    #   rows_ref    [v, rb/4-or-1, s, n_pos*feat_in] bf16 raw patch rows
    #   coef_ref    [v, rb/4, 4, s, n_pos] bf16 per-tap stencil coefs
    # then both:
    #   pts_ref     [rb, s/2, 6] f32 packed sample positions
    #   vcode_ref   [rb, 1, POSENC] bf16 per-ray view embedding
    #   centers_ref [v+1, 3] f32 target + source camera centers
    #   proj_ref    [v, 3, 4] f32 K @ w2c rows
    #   sel_ref     [128, 128] f32 block-diag half-averaging matrix (J64/64)
    if patch_combine:
        rows_ref, coef_ref, e_ref = refs[:3]
        pts_ref, vcode_ref, centers_ref, proj_ref, sel_ref, *rest = refs[3:]
    else:
        rf_ref = refs[0]
        pts_ref, vcode_ref, centers_ref, proj_ref, sel_ref, *rest = refs[1:]
    weight_refs = rest[:-3]
    rgb_out_ref, w_out_ref, cnt_out_ref = rest[-3:]
    widx = [0]

    def next_w():
        w = weight_refs[widx[0]][:]
        widx[0] += 1
        return w

    dtype = jnp.bfloat16
    s2 = s // 2
    ns2 = rb * s2          # packed ray-token rows
    nv2 = v * ns2          # packed view-token rows
    sel = sel_ref[:]

    def dense(x, w, b=None):
        out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        if b is not None:
            out = out + b.astype(jnp.float32)
        return out.astype(dtype)

    def layernorm2(x, scale, bias, eps=1e-6):
        """Per-64-lane-half layernorm via the Sel averaging matmul."""
        xf = x.astype(jnp.float32)
        mu = jnp.dot(xf, sel, preferred_element_type=jnp.float32)
        msq = jnp.dot(xf * xf, sel, preferred_element_type=jnp.float32)
        var = jnp.maximum(msq - mu * mu, 0.0)
        out = (xf - mu) * jax.lax.rsqrt(var + eps)
        return (out * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
            dtype
        )

    # ---- in-VMEM folds from the packed sample positions ------------------
    eps = 1e-6
    xyz = pts_ref[:].reshape(ns2, 6).astype(jnp.float32)
    xe, xo = xyz[:, 0:3], xyz[:, 3:6]
    centers = centers_ref[:]

    def unit(x):
        n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        return x / (n + eps)

    tt_e = unit(centers[0:1] - xe)
    tt_o = unit(centers[0:1] - xo)
    rd_rows = []
    for i in range(v if ablate != "nofold" else 0):
        c = centers[i + 1 : i + 2]
        ts_e, ts_o = unit(c - xe), unit(c - xo)
        de, do = tt_e - ts_e, tt_o - ts_o
        dne = jnp.sqrt(jnp.sum(de * de, axis=-1, keepdims=True))
        dno = jnp.sqrt(jnp.sum(do * do, axis=-1, keepdims=True))
        dot_e = jnp.sum(tt_e * ts_e, axis=-1, keepdims=True)
        dot_o = jnp.sum(tt_o * ts_o, axis=-1, keepdims=True)
        rd_rows.append(
            jnp.concatenate(
                [de / jnp.maximum(dne, eps), dot_e,
                 do / jnp.maximum(dno, eps), dot_o],
                axis=-1,
            )
        )
    ray_diff = (
        jnp.zeros((nv2, 8), dtype)
        if ablate == "nofold"
        else jnp.concatenate(rd_rows, axis=0).astype(dtype)
    )  # [nv2, 8]

    # validity mask (project_points + pixel_inbound), dup across lane halves
    mh, mw = fold_mask_hw
    proj = proj_ref[:]
    ones64 = jnp.ones((1, NW), jnp.float32)
    mask_rows = []
    for i in range(v if ablate != "nofold" else 0):
        p = proj[i]
        cols = []
        for xh in (xe, xo):
            px, py, pz = xh[:, 0:1], xh[:, 1:2], xh[:, 2:3]
            uc = px * p[0, 0] + py * p[0, 1] + pz * p[0, 2] + p[0, 3]
            vc = px * p[1, 0] + py * p[1, 1] + pz * p[1, 2] + p[1, 3]
            zc = px * p[2, 0] + py * p[2, 1] + pz * p[2, 2] + p[2, 3]
            zden = jnp.maximum(zc, 1e-8)
            uu = jnp.clip(uc / zden, -1e6, 1e6)
            vv = jnp.clip(vc / zden, -1e6, 1e6)
            inb = (
                (uu >= 0.0)
                & (uu <= mw - 1.0)
                & (vv >= 0.0)
                & (vv <= mh - 1.0)
                & (zc > 0.0)
            )
            cols.append(inb.astype(jnp.float32) * ones64)  # [ns2, 64]
        mask_rows.append(jnp.concatenate(cols, axis=-1))   # [ns2, 128]
    mask_col = (
        jnp.ones((nv2, NP), jnp.float32)
        if ablate == "nofold"
        else jnp.concatenate(mask_rows, axis=0)
    )                                                       # [nv2, 128]

    # pts sinusoidal embedding, packed lanes (6-groups of [e | o])
    pparts = [xyz]
    psn, pcs = jnp.sin(xyz), jnp.cos(xyz)
    for _ in range(10):
        pparts.append(psn)
        pparts.append(pcs)
        psn, pcs = 2.0 * psn * pcs, pcs * pcs - psn * psn
    pts_code = jnp.concatenate(pparts, axis=-1)             # [ns2, 126]
    vcode = vcode_ref[:].astype(jnp.float32)                # [rb, 1, POSENC]
    vcode_b = jnp.broadcast_to(vcode, (rb, s2, POSENC)).reshape(ns2, POSENC)
    pos_code = (
        jnp.zeros((ns2, 126 + POSENC), dtype)
        if ablate == "nofold"
        else jnp.concatenate([pts_code, vcode_b], axis=-1).astype(dtype)
    )

    def vslice(x, i):
        return x[i * ns2 : (i + 1) * ns2]

    cnt = vslice(mask_col, 0)
    for i in range(1, v):
        cnt = cnt + vslice(mask_col, i)
    all_invalid = cnt == 0.0
    view_bias = jnp.where(
        (mask_col == 0.0) & (~jnp.concatenate([all_invalid] * v, axis=0)),
        NEG,
        0.0,
    )

    if patch_combine:
        # ---- in-kernel patch combine, composed with rgbfeat_fc_0 --------
        # (sum_p rows_p * coef_p) @ W0 == (rows * expand(coef)) @ tile(W0)
        # by linearity: the [*, C]-minor combined tensor (which XLA pads to
        # 128 lanes — 3.7x wasted HBM traffic) never exists anywhere.
        # With blocks larger than a ray quad (e.g. 4x2 -> n_pos=24) the
        # SAME rows block serves every quad of the block — rows_ref's
        # second dim is 1 and only coef differs per grid step.
        bstep = rb // 4
        cp = n_pos * feat_in
        n_rblk = rows_ref.shape[1]     # rows blocks resident this step
        w0t, b0 = next_w(), next_w()   # [n_pos*C, NW] tiled W0; [128] bias
        # coef lane expansion operand: E[p, l] = 1 iff l // feat_in == p
        E = e_ref[:].astype(dtype)
        hs = []
        if n_rblk == bstep:
            # one rows block per ray quad: batch all quads per tap
            n_rs = v * bstep * s
            rows2d = rows_ref[:].reshape(n_rs, cp).astype(dtype)
            coef = coef_ref[:].reshape(v * bstep, 4, s, n_pos)
            for t in range(4):
                ce = jnp.dot(
                    coef[:, t].reshape(n_rs, n_pos).astype(dtype), E,
                    preferred_element_type=jnp.float32,
                ).astype(dtype)
                h0 = jnp.dot(
                    rows2d * ce, w0t.astype(dtype),
                    preferred_element_type=jnp.float32,
                ).reshape(v * bstep, s, NW)                  # [vb, s, 64] f32
                # half-split pair packing (tokens k and k + s/2 share a
                # row): a contiguous lane concat, unlike adjacent-pair
                # interleaving
                hs.append(
                    jnp.concatenate([h0[:, :s2], h0[:, s2:]], axis=-1)[
                        :, None
                    ]
                )
        else:
            # n_rblk == 1 < bstep: every quad of this step shares ONE rows
            # block (8-ray patch blocks at ray_block=8) — loop quads so the
            # rows tensor is never tiled in VMEM
            n_rs = v * s
            rows2d = rows_ref[:].reshape(n_rs, cp).astype(dtype)
            coef = coef_ref[:].reshape(v, bstep, 4, s, n_pos)
            for qd in range(bstep):
                for t in range(4):
                    ce = jnp.dot(
                        coef[:, qd, t].reshape(n_rs, n_pos).astype(dtype), E,
                        preferred_element_type=jnp.float32,
                    ).astype(dtype)
                    h0 = jnp.dot(
                        rows2d * ce, w0t.astype(dtype),
                        preferred_element_type=jnp.float32,
                    ).reshape(v, s, NW)
                    hs.append(
                        jnp.concatenate([h0[:, :s2], h0[:, s2:]], axis=-1)[
                            :, None
                        ]
                    )
        # hs order is (quad, tap) in both paths -> rows (v, quad*4+tap, s2)
        h0p = jnp.concatenate(hs, axis=1).reshape(nv2, NP)   # [v*rb*s2, 128]
        h = (h0p + b0.astype(jnp.float32)).astype(dtype)
        h = dense(jax.nn.relu(h), next_w(), next_w())        # [nv2, 128]
    else:
        rgb_feat = rf_ref[:].reshape(nv2, 2 * feat_in).astype(dtype)
        h = dense(rgb_feat, next_w(), next_w())
        h = dense(jax.nn.relu(h), next_w(), next_w())        # [nv2, 128]

    # ---- cross-block v/pos: either 2 wide full-depth matmuls (small rb;
    # [nv2, D*128] residents) or per-block slices of the same weights
    # (large rb; 1/DEPTH the VMEM residency at identical FLOPs). The k
    # projection is composed into the a0 sum (see flatten) — ONE [128,128]
    # matmul on each of the h / pos_in sides covers all 8 blocks ----------
    ka0_all, wkv_all = next_w(), next_w()
    p0w, p0b = next_w(), next_w()
    p1w, p1b = next_w(), next_w()
    pa0_w, ca0 = next_w(), next_w()
    pos_in = jax.nn.relu(
        jnp.dot(
            ray_diff, p0w.astype(dtype), preferred_element_type=jnp.float32
        )
        + p0b.astype(jnp.float32)
    ).astype(dtype)
    # full-width (k + pos + bias) @ w_a0 for ALL blocks, kept in f32; the
    # per-block q-side lands in its 16-lane group via wqa0_emb
    # accumulated in f32, STORED bf16: mono3 (and the flax reference at
    # dtype=bf16) run this whole attn_fc_0 chain in bf16 denses, so bf16
    # residency loses no precision the network ever had — and the [nv2,128]
    # stream feeds 8 blocks of VPU work (measured: view side is VPU-bound)
    a0sum = (
        jnp.dot(h, ka0_all.astype(dtype), preferred_element_type=jnp.float32)
        + jnp.dot(
            pos_in, pa0_w.astype(dtype), preferred_element_type=jnp.float32
        )
        + ca0.astype(jnp.float32)
    ).astype(dtype)                                          # [nv2, 128]
    if precompute_kv:
        vp_all = dense(h, wkv_all)
        pos_all = dense(pos_in, p1w, p1b)                    # [nv2, D*128]

    q = vslice(h, 0)
    for i in range(1, v):
        q = jnp.maximum(q, vslice(h, i))                     # [ns2, 128]

    # lane-half selection matrices: Mosaic cannot concatenate a lane-sliced
    # (offset-64) vector along a non-lane dim, so even/odd halves are
    # extracted by exact selection MATMULS, which produce canonical
    # offset-0 layouts (and the MXU is idle at these points anyway)
    eye64 = jnp.eye(NW, dtype=dtype)
    z64 = jnp.zeros((NW, NW), dtype)
    sel_e = jnp.concatenate([eye64, z64], axis=0)  # [128, 64]
    sel_o = jnp.concatenate([z64, eye64], axis=0)

    def halves(x2d):
        """[n, 128] -> ([n, 64], [n, 64]) with canonical layouts."""
        xe = jnp.dot(x2d, sel_e, preferred_element_type=jnp.float32)
        xo = jnp.dot(x2d, sel_o, preferred_element_type=jnp.float32)
        return xe.astype(dtype), xo.astype(dtype)

    def unpack_eo(x):
        """[ns2, 128] packed -> [rb, s, 64] in evens-then-odds order."""
        xe, xo = halves(x)
        return jnp.concatenate(
            [xe.reshape(rb, s2, NW), xo.reshape(rb, s2, NW)], axis=1
        )

    def pack_eo(x):
        """[rb, s, 64] evens-then-odds -> [ns2, 128] packed."""
        return jnp.concatenate([x[:, :s2], x[:, s2:]], axis=-1).reshape(
            ns2, NP
        )

    # sample-pad masking (s_real < s when the merged coarse+fine count was
    # padded to the 16-multiple the lane packing needs): pad tokens are
    # excluded from every cross-token op — ray-attention keys get a NEG
    # logit bias and the final pool zeroes them — so results equal the
    # unpadded network exactly (pad QUERY rows compute garbage that is
    # sliced off / zero-weighted, never read)
    pad_neg = None
    if s_real != s:
        seq = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
        if patch_combine:
            tq = seq  # half-split pairing: unpacked order IS true order
        else:
            tq = jnp.where(seq < s2, 2 * seq, 2 * (seq - s2) + 1)
        pad_neg = jnp.where(tq >= s_real, NEG, 0.0).astype(jnp.float32)

    weights_out = None
    for blk in range(DEPTH):
        bsl = slice(blk * NP, (blk + 1) * NP)
        if precompute_kv:
            vp = vp_all[:, bsl]
            pos = pos_all[:, bsl]
        else:
            vp = dense(h, wkv_all[:, bsl])
            # p1w is block-diagonal: the column slice keeps only this
            # block's rows nonzero, so the full-width contraction is exact
            pos = dense(pos_in, p1w[:, bsl], p1b[bsl])

        ln_s, ln_b = next_w(), next_w()
        wqa0_emb = next_w()
        wa1_emb, b_a1 = next_w(), next_w()
        w_out, b_out = next_w(), next_w()
        ffn_s, ffn_b = next_w(), next_w()
        wf1, bf1, wf2, bf2 = next_w(), next_w(), next_w(), next_w()
        if ablate != "min" and ablate != "noview":
            x = layernorm2(q, ln_s, ln_b)
            # q-side of the composed a0 chain, embedded at this block's
            # lane group; other lanes carry other blocks' (stale-q) values
            # which wa1_emb's zero rows discard after the relu
            qa = jnp.dot(
                x, wqa0_emb.astype(dtype), preferred_element_type=jnp.float32
            ).astype(dtype)
            qtile = jnp.concatenate([qa] * v, axis=0)        # [nv2, 128]
            t = jax.nn.relu(a0sum - qtile)
            lg = dense(t, wa1_emb, b_a1)
            lg = lg.astype(jnp.float32) + view_bias
            val = vp + pos  # bf16; upcast happens inside the f32 agg fma

            mx = vslice(lg, 0)
            for i in range(1, v):
                mx = jnp.maximum(mx, vslice(lg, i))
            den = jnp.zeros((ns2, NP), jnp.float32)
            agg = jnp.zeros((ns2, NP), jnp.float32)
            for i in range(v):
                # logit weights carry LOG2E (see flatten): exp2 is exact here
                ex = jnp.exp2(vslice(lg, i) - mx)
                den = den + ex
                agg = agg + ex * vslice(val, i)
            agg = (agg / den).astype(dtype)

            agg = dense(agg, w_out, b_out)
            x = agg + q
            y = layernorm2(x, ffn_s, ffn_b)
            y = dense(jax.nn.relu(dense(y, wf1, bf1)), wf2, bf2)
            q = y + x

        if blk % 2 == 0:
            wq0, bq0, wq1, bq1 = next_w(), next_w(), next_w(), next_w()
            if ablate != "min":
                qcat = jnp.concatenate([q, pos_code], axis=-1)  # [ns2, 317]
                q = dense(qcat, wq0, bq0)
                q = dense(jax.nn.relu(q), wq1, bq1)

        # ---- ray attention on the evens-then-odds sequence --------------
        rln_s, rln_b = next_w(), next_w()
        mcat = next_w()
        pcat = next_w()
        bo = next_w()
        rffn_s, rffn_b = next_w(), next_w()
        rf1, rb1, rf2, rb2 = next_w(), next_w(), next_w(), next_w()
        if ablate in ("min", "noray"):
            weights_out = jnp.full((rb, 1, s), 1.0 / s, jnp.float32)
            continue
        xr = layernorm2(q, rln_s, rln_b)
        xr_eo = unpack_eo(xr)                                # [rb, s, 64]
        z = jnp.dot(
            xr_eo.reshape(rb * s, NW), mcat.astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype).reshape(rb, s, HEADS * NW)
        pm = jnp.dot(
            xr_eo.reshape(rb * s, NW), pcat.astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype).reshape(rb, s, HEADS * NW)

        acc = None
        w_acc = None
        for hh in range(HEADS):
            sl = slice(hh * NW, (hh + 1) * NW)
            lgh = jax.lax.dot_general(
                z[:, :, sl], xr_eo,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if pad_neg is not None:
                lgh = lgh + pad_neg
            lgh = lgh - jnp.max(lgh, axis=-1, keepdims=True)
            exh = jnp.exp2(lgh)  # mcat carries LOG2E (see flatten): exact
            den = jnp.sum(exh, axis=-1, keepdims=True)      # [rb, s, 1]
            # normalize AFTER the value matmul: [rb, s, 64] divisions
            # instead of [rb, s, s] — the softmax scale is per-query, so
            # it commutes with the key-axis contraction
            outh = jax.lax.dot_general(
                exh.astype(dtype), pm[:, :, sl],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) / den
            acc = outh if acc is None else acc + outh
            # query 0 == true sample 0 in eo order; only this row of the
            # attention matrix is ever read, so normalize just it
            fr = exh[:, 0:1, :] / den[:, 0:1]
            w_acc = fr if w_acc is None else w_acc + fr
        out = (acc + bo.astype(jnp.float32)).astype(dtype)   # [rb, s, 64] eo
        xq = q + pack_eo(out)
        y = layernorm2(xq, rffn_s, rffn_b)
        y = dense(jax.nn.relu(dense(y, rf1, rb1)), rf2, rb2)
        q = xq + y

        weights_out = w_acc / HEADS                          # [rb, 1, s] eo

    hq = layernorm2(q, next_w(), next_w())
    # mean over samples of both lane halves, via the half-sum selection
    # matmul (lane-sliced adds don't lower in Mosaic)
    if s_real != s:
        # zero pad tokens before pooling; divide by the REAL sample count
        rowk = jax.lax.broadcasted_iota(jnp.int32, (ns2, NP), 0) % s2
        half = jax.lax.broadcasted_iota(jnp.int32, (ns2, NP), 1) // NW
        tq2 = (rowk + half * s2) if patch_combine else (2 * rowk + half)
        hqm = jnp.where(tq2 < s_real, hq.astype(jnp.float32), 0.0)
        pool_tok = jnp.dot(
            hqm, (sel_e + sel_o).astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        pooled = jnp.sum(pool_tok.reshape(rb, s2, NW), axis=1) / s_real
    else:
        pool_tok = jnp.dot(
            hq, 0.5 * (sel_e + sel_o).astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )                                                    # [ns2, 64]
        pooled = jnp.mean(pool_tok.reshape(rb, s2, NW), axis=1)  # [rb, 64]
    rgb = dense(pooled.astype(dtype), next_w(), next_w())

    rgb_out_ref[0] = rgb.astype(jnp.float32)
    w_out_ref[0] = weights_out.astype(jnp.float32)           # eo order
    # attention-weighted valid-view count (see mono3). cnt lanes are
    # half-duplicated [cnt_e*ones(64) | cnt_o*ones(64)]; broadcast to the
    # eo sample sequence with the same halves()/concat machinery, then
    # reduce jointly over (sample, lane)
    ce, co = halves(cnt.astype(dtype))                       # [ns2, 64] each
    cnt_eo = jnp.concatenate(
        [ce.reshape(rb, s2, NW), co.reshape(rb, s2, NW)], axis=1
    ).astype(jnp.float32)                                    # [rb, s, 64]
    cnt_s = jnp.sum(cnt_eo, axis=2) * (1.0 / NW)             # [rb, s]
    tot = jnp.sum(
        weights_out.reshape(rb, s) * cnt_s, axis=1, keepdims=True
    )                                                        # [rb, 1]
    cnt_out_ref[0] = tot * (1.0 / v)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ray_block",
        "interpret",
        "fold_mask_hw",
        "precompute_kv",
        "ablate",
    ),
)
def gnt_fused_apply_mono4(
    gnt_params,
    rgb_feat,
    pts,
    view_code,
    cam_centers,
    proj_mats,
    fold_mask_hw,
    ray_block: int = 4,
    interpret: bool = False,
    precompute_kv: bool = True,
    ablate: str = "",
    patch_rows=None,
    patch_coef=None,
):
    """128-lane packed fused GNT forward (full fold set, views-outer only).

    Args:
      rgb_feat: [V, R, S, C] bf16 sampled features, NO mask channel — or
        None with patch_rows/patch_coef (the in-kernel combine path).
      pts: [R, S, 3] f32 world sample positions.
      view_code: [R, POSENC] per-ray view-direction embedding.
      cam_centers: [V+1, 3] target-then-sources camera centers.
      proj_mats: [V, 3, 4] (or [V, 4, 4]) K @ w2c rows.
      fold_mask_hw: static (H, W) of the source maps for inbound checks.
      patch_rows/patch_coef: raw patch-gather rows
        [V, R/block_rays, S, n_pos*C] + stencil coefficients
        [V, R/4, 4, S, n_pos] (``epipolar_sample_patch_raw``); the stencil
        combine happens inside the kernel, composed into rgbfeat_fc_0.
        Requires ray_block % 4 == 0 (== 4 when block_rays > 4) and rays
        ordered in pixel blocks matching the patch maps.

    Returns {rgb [R, 3], weights [R, S], inbound_cnt_raw [R]} — identical
    contract to mono3's fold_mask path (weights in true sample order).
    """
    patch_combine = patch_rows is not None
    if patch_combine:
        v, nrb, s, cp = patch_rows.shape
        n_pos = patch_coef.shape[-1]
        feat_in = cp // n_pos
        r = patch_coef.shape[1] * 4
        block_rays = r // nrb
        if block_rays == 4:
            if ray_block % 4 != 0:
                raise ValueError(
                    f"patch_rows needs ray_block % 4 == 0, got {ray_block}"
                )
        elif block_rays == 8:
            if ray_block not in (4, 8):
                raise ValueError(
                    "8-ray patch blocks need ray_block 4 (two grid steps "
                    "share one rows block) or 8 (both quads of one step "
                    f"share it), got {ray_block}"
                )
        else:
            raise ValueError(f"unsupported patch block_rays {block_rays}")
        rows_per_step = block_rays // 4  # grid steps sharing one rows block
    else:
        v, r, s, feat_in = rgb_feat.shape
    if ablate not in ("", "min", "noview", "noray", "nofold"):
        # a typo (or a mono2-style spelling like 'no_view') would silently
        # run the FULL kernel and corrupt perf-attribution data (ADVICE r3)
        raise ValueError(f"mono4 ablate must be one of "
                         f"''/min/noview/noray/nofold, got {ablate!r}")
    if r % ray_block != 0:
        raise ValueError(f"rays {r} not divisible by ray_block {ray_block}")
    # sample-count padding: the lane packing needs s % 16 == 0 (s/2 packed
    # pairs in sublane multiples of 8). Odd merged coarse+fine counts are
    # PADDED, and the pad tokens masked out of ray attention + pooling in
    # the kernel — exact, no silent mono3 fallback (VERDICT r3 item 6)
    s_real = s
    if s % 16 != 0:
        s_pad = -(-s // 16) * 16
        dpad = s_pad - s
        pts = jnp.concatenate(
            [pts, jnp.repeat(pts[:, -1:], dpad, axis=1)], axis=1
        )
        if patch_combine:
            patch_rows = jnp.concatenate(
                [patch_rows, jnp.repeat(patch_rows[:, :, -1:], dpad, axis=2)],
                axis=2,
            )
            patch_coef = jnp.concatenate(
                [
                    patch_coef,
                    jnp.zeros(
                        patch_coef.shape[:3] + (dpad, n_pos), patch_coef.dtype
                    ),
                ],
                axis=3,
            )
        else:
            rgb_feat = jnp.concatenate(
                [
                    rgb_feat,
                    jnp.zeros((v, r, dpad, feat_in), rgb_feat.dtype),
                ],
                axis=2,
            )
        s = s_pad
    weights = flatten_gnt_params_mono4(
        gnt_params,
        patch_combine=patch_combine,
        n_pos=n_pos if patch_combine else 16,
    )
    grid = (r // ray_block,)
    s2 = s // 2

    if patch_combine:
        # half-split sample pairing (token k pairs with k + s/2): the pack
        # is then a contiguous lane concat in VMEM, and the unpacked ray-
        # attention sequence / weights come out in TRUE sample order
        pts_p = jnp.concatenate(
            [pts[:, :s2, :], pts[:, s2:, :]], axis=-1
        ).astype(jnp.float32)
        bstep = ray_block // 4
        # rows blocks resident per grid step (>=1); the index map is in
        # BLOCK units, so for every (ray_block, block_rays) combination the
        # step's first rows block is (i * bstep) // (rows_per_step * n_rblk)
        n_rblk = max(bstep // rows_per_step, 1)
        data_specs = [
            pl.BlockSpec(
                (v, n_rblk, s, cp),
                lambda i, bs=bstep, d=rows_per_step * n_rblk: (
                    0, (i * bs) // d, 0, 0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (v, bstep, 4, s, n_pos), lambda i: (0, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        data_ops = [
            patch_rows.astype(jnp.bfloat16),
            patch_coef.astype(jnp.bfloat16),
            jnp.asarray(
                np.kron(np.eye(n_pos), np.ones((1, feat_in))), jnp.bfloat16
            ),
        ]
    else:
        # adjacent pairing (2k, 2k+1): free at the HBM input boundary
        # ([V, R, S, C] row-major regroups to [V, R, S/2, 2C] in place)
        packed = rgb_feat.astype(jnp.bfloat16).reshape(v, r, s2, 2 * feat_in)
        pts_p = pts.astype(jnp.float32).reshape(r, s2, 6)
        data_specs = [
            pl.BlockSpec(
                (v, ray_block, s2, 2 * feat_in),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        data_ops = [packed]
    vcode = view_code.astype(jnp.bfloat16)[:, None, :]
    sel = jax.lax.convert_element_type(
        jnp.kron(jnp.eye(2), jnp.full((NW, NW), 1.0 / NW)), jnp.float32
    )

    in_specs = data_specs + [
        pl.BlockSpec(
            (ray_block, s2, 6), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (ray_block, 1, POSENC), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = data_ops + [
        pts_p,
        vcode,
        jnp.asarray(cam_centers, jnp.float32),
        jnp.asarray(proj_mats, jnp.float32)[:, :3, :],
        sel,
    ]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    operands += weights

    rgb, w, cnt = pl.pallas_call(
        functools.partial(
            _gnt_kernel4, ray_block, s, v, feat_in,
            (float(fold_mask_hw[0]), float(fold_mask_hw[1])),
            precompute_kv, ablate, patch_combine, s_real,
            n_pos if patch_combine else 16,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, ray_block, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, ray_block, 1, s),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ray_block, 1), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid[0], ray_block, 3), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], ray_block, 1, s), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], ray_block, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 if ray_block <= 4 else 127) * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    if patch_combine:
        # half-split pairing: the kernel's unpacked sequence IS true
        # sample order — no un-permute
        w_true = w.reshape(r, s)
    else:
        # un-permute the evens-then-odds weights to true sample order
        w_eo = w.reshape(r, s)
        w_true = (
            jnp.stack([w_eo[:, :s2], w_eo[:, s2:]], axis=-1).reshape(r, s)
        )
    if s_real != s:
        w_true = w_true[:, :s_real]  # pad samples carry ~0 weight
    return {
        "rgb": rgb.reshape(r, 3),
        "weights": w_true,
        "inbound_cnt_raw": cnt.reshape(r),
    }
