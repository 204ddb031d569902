"""Monolithic fused GNT transformer, v3 — cross-block width folding.

Kernel bisection of v2 (STATUS round 3) showed the per-block ray/view
attentions are NOT the bottleneck: ~half the kernel time is the "base" —
dominated by the per-block k/v/pos projections over the big views-outer
token tensor ([nv, 64], nv = 10x the ray-token count). Those projections
do not depend on the ray state q, only on the fixed tokens h / ray_diff,
so across the 8 blocks they are data-independent and can be computed once
as FULL-WIDTH matmuls:

  kp_all  = h @ [Wk_0 | ... | Wk_7]                  [nv, 64] x [64, 512]
  vp_all  = h @ [Wk_0 Wv_0 | ... | Wk_7 Wv_7]        (v_fc reads kp -> fold)
  pos_all = relu(rd @ P0cat + b0) @ blockdiag(P1) + b1

replacing 32 narrow [nv, 64]x[64, 64-or-8] matmuls with 3 wide ones (a
512-wide output uses all MXU lanes; the 64-wide originals waste half) plus
one tiny [nv, 4]x[4, 64]. The block loop then consumes 64-lane slices of
the precomputed tensors — static lane slices, no relayout.

Everything else (masked view softmax, folded ray attention, FFs, q_fc
injection) matches ``gnt_fused_mono2``; ``fold_ray_diff`` is supported the
same way. Numerics: folding computed in f32, rounded to bf16 once.

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
DEPTH = 8
HEADS = 4
POSENC = 63
NEG = -1e30
PH = 8  # pos/attn bottleneck hidden width (netwidth // 8)


def _layernorm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * scale + bias).astype(x.dtype)


def _dense(x, w, b=None):
    out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def flatten_gnt_params_mono3(gnt_params) -> List[jnp.ndarray]:
    """Flax GNT params -> mono3 weight list (see module docstring)."""
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

    wk_cat, wkv_cat, p0_cat, b0_cat = [], [], [], []
    p1_bd = jnp.zeros((DEPTH * PH, DEPTH * NW), jnp.float32)
    b1_cat = []
    for blk in range(DEPTH):
        wk = get(blk, vt(blk), "attn", "k_fc", "kernel")
        wv = get(blk, vt(blk), "attn", "v_fc", "kernel")
        wk_cat.append(wk)
        wkv_cat.append(wk @ wv)
        p0_cat.append(get(blk, vt(blk), "attn", "pos_fc_0", "kernel"))
        b0_cat.append(get(blk, vt(blk), "attn", "pos_fc_0", "bias"))
        p1 = get(blk, vt(blk), "attn", "pos_fc_1", "kernel")  # [PH, NW]
        p1_bd = p1_bd.at[
            blk * PH : (blk + 1) * PH, blk * NW : (blk + 1) * NW
        ].set(p1)
        b1_cat.append(get(blk, vt(blk), "attn", "pos_fc_1", "bias"))

    out = [
        jnp.asarray(p["rgbfeat_fc_0"]["kernel"], jnp.float32),
        jnp.asarray(p["rgbfeat_fc_0"]["bias"], jnp.float32),
        jnp.asarray(p["rgbfeat_fc_1"]["kernel"], jnp.float32),
        jnp.asarray(p["rgbfeat_fc_1"]["bias"], jnp.float32),
        jnp.concatenate(wk_cat, axis=1),      # [NW, DEPTH*NW]
        jnp.concatenate(wkv_cat, axis=1),     # [NW, DEPTH*NW]
        jnp.concatenate(p0_cat, axis=1),      # [4, DEPTH*PH]
        jnp.concatenate(b0_cat, axis=0),      # [DEPTH*PH]
        p1_bd,                                # [DEPTH*PH, DEPTH*NW]
        jnp.concatenate(b1_cat, axis=0),      # [DEPTH*NW]
    ]

    hd = NW // HEADS
    for blk in range(DEPTH):
        v = vt(blk)
        r = rt(blk)
        out += [
            get(blk, v, "attn_norm", "scale"), get(blk, v, "attn_norm", "bias"),
            get(blk, v, "attn", "q_fc", "kernel"),
            get(blk, v, "attn", "attn_fc_0", "kernel"),
            get(blk, v, "attn", "attn_fc_0", "bias"),
            get(blk, v, "attn", "attn_fc_1", "kernel"),
            get(blk, v, "attn", "attn_fc_1", "bias"),
            get(blk, v, "attn", "out_fc", "kernel"),
            get(blk, v, "attn", "out_fc", "bias"),
            get(blk, v, "ff_norm", "scale"), get(blk, v, "ff_norm", "bias"),
            get(blk, v, "ff", "fc1", "kernel"), get(blk, v, "ff", "fc1", "bias"),
            get(blk, v, "ff", "fc2", "kernel"), get(blk, v, "ff", "fc2", "bias"),
        ]
        if blk % 2 == 0:
            out += [
                get(blk, "q_fc_0", "kernel"), get(blk, "q_fc_0", "bias"),
                get(blk, "q_fc_1", "kernel"), get(blk, "q_fc_1", "bias"),
            ]
        wq = get(blk, r, "attn", "q_fc", "kernel")
        wkr = get(blk, r, "attn", "k_fc", "kernel")
        wvr = get(blk, r, "attn", "v_fc", "kernel")
        wo = get(blk, r, "attn", "out_fc", "kernel")
        ms, ps = [], []
        for h in range(HEADS):
            sl = slice(h * hd, (h + 1) * hd)
            ms.append(wq[:, sl] @ wkr[:, sl].T / np.sqrt(hd))
            ps.append(wvr[:, sl] @ wo[sl, :])
        out += [
            get(blk, r, "attn_norm", "scale"), get(blk, r, "attn_norm", "bias"),
            jnp.concatenate(ms, axis=1),      # Mcat
            jnp.concatenate(ps, axis=1),      # Pcat
            get(blk, r, "attn", "out_fc", "bias"),
            get(blk, r, "ff_norm", "scale"), get(blk, r, "ff_norm", "bias"),
            get(blk, r, "ff", "fc1", "kernel"), get(blk, r, "ff", "fc1", "bias"),
            get(blk, r, "ff", "fc2", "kernel"), get(blk, r, "ff", "fc2", "bias"),
        ]
    out += [
        jnp.asarray(p["norm"]["scale"], jnp.float32),
        jnp.asarray(p["norm"]["bias"], jnp.float32),
        jnp.asarray(p["rgb_fc"]["kernel"], jnp.float32),
        jnp.asarray(p["rgb_fc"]["bias"], jnp.float32),
    ]
    return [jnp.asarray(w).astype(jnp.bfloat16) for w in out]


def _gnt_kernel3(
    rb: int,
    s: int,
    v: int,
    feat_in: int,
    fold_ray_diff: bool,
    separate_mask: bool,
    fold_pos_code: bool,
    fold_lerp: bool,
    fold_mask_hw,
    rf_ref,
    *rest,
):
    if separate_mask:
        mask_ref = rest[0]
        rest = rest[1:]
    if fold_lerp:
        frac_ref = rest[0]  # [v, rb, s, 2] f32 fractional offsets
        rest = rest[1:]
    rd_ref = rest[0]   # [v, rb, s, 4] or pts [rb, s, 3] with fold_ray_diff
    pos_code_ref = rest[1]
    rest = rest[2:]
    if fold_ray_diff:
        centers_ref = rest[0]
        rest = rest[1:]
    if fold_mask_hw is not None:
        proj_ref = rest[0]  # [v, 3, 4] f32 combined K @ w2c rows
        rest = rest[1:]
    weight_refs = rest[:-3]
    rgb_out_ref, w_out_ref, cnt_out_ref = rest[-3:]
    widx = [0]

    def next_w():
        w = weight_refs[widx[0]][:]
        widx[0] += 1
        return w

    dtype = jnp.bfloat16
    ns = rb * s
    nv = v * ns

    if fold_lerp:
        # rf_ref carries the RAW gathered quad rows [v, rb, s, 4*feat_in];
        # the bilinear combine happens here in VMEM (the [*, feat_in] lerp
        # output never exists in HBM). Weight formula matches
        # projector.quad_bilinear's zero-pad semantics exactly.
        rows = rf_ref[:].reshape(nv, 4 * feat_in)
        fr = frac_ref[:].reshape(nv, 2).astype(jnp.float32)
        fx, fy = fr[:, 0:1], fr[:, 1:2]
        wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(fx))
        wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(fx - 1.0))
        wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(fy))
        wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(fy - 1.0))
        c = feat_in
        rgb_feat = (
            rows[:, :c] * (wx0 * wy0).astype(dtype)
            + rows[:, c : 2 * c] * (wx1 * wy0).astype(dtype)
            + rows[:, 2 * c : 3 * c] * (wx0 * wy1).astype(dtype)
            + rows[:, 3 * c :] * (wx1 * wy1).astype(dtype)
        ).astype(dtype)
        mask_col = (
            mask_ref[:].reshape(nv, 1).astype(jnp.float32)
            if separate_mask
            else None  # fold_mask: recomputed below from xyz + proj rows
        )
    elif fold_mask_hw is not None:
        # rgb_feat without the mask channel AND no mask input at all: the
        # validity mask (inbound & in_front — project_points/pixel_inbound
        # semantics) is recomputed here from the sample positions and the
        # per-view K @ w2c rows, after xyz is loaded below. This removes
        # the [V, R, S, 1] mask stream and its XLA-side build (a ~1 s/view
        # pathological-layout fusion chain at bench scale,
        # scripts/profile_render_trace.py).
        rgb_feat = rf_ref[:].reshape(nv, feat_in).astype(dtype)
        mask_col = None
    elif separate_mask:
        # rgb_feat arrives without the mask channel (straight from the
        # sampler's lerp fusion — no XLA-side concat copy); the validity
        # mask is its own [v, rb, s, 1] input
        rgb_feat = rf_ref[:].reshape(nv, feat_in).astype(dtype)
        mask_col = mask_ref[:].reshape(nv, 1).astype(jnp.float32)
    else:
        packed = rf_ref[:].reshape(nv, feat_in + 1)
        rgb_feat = packed[:, :feat_in].astype(dtype)
        mask_col = packed[:, feat_in:].astype(jnp.float32)
    if fold_ray_diff:
        eps = 1e-6
        xyz = rd_ref[:].reshape(ns, 3).astype(jnp.float32)
        centers = centers_ref[:]

        def unit(x):
            n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
            return x / (n + eps)

        to_tgt = unit(centers[0:1] - xyz)
        rd_rows = []
        for i in range(v):
            to_src = unit(centers[i + 1 : i + 2] - xyz)
            diff = to_tgt - to_src
            dn = jnp.sqrt(jnp.sum(diff * diff, axis=-1, keepdims=True))
            dot = jnp.sum(to_tgt * to_src, axis=-1, keepdims=True)
            rd_rows.append(
                jnp.concatenate([diff / jnp.maximum(dn, eps), dot], axis=-1)
            )
        ray_diff = jnp.concatenate(rd_rows, axis=0).astype(dtype)
    else:
        ray_diff = rd_ref[:].reshape(nv, 4).astype(dtype)
    if fold_mask_hw is not None:
        # cameras.project_points + pixel_inbound, per view on the VPU
        mh, mw = fold_mask_hw
        proj = proj_ref[:]  # [v, 3, 4]
        px, py, pz = xyz[:, 0:1], xyz[:, 1:2], xyz[:, 2:3]
        mcols = []
        for i in range(v):
            p = proj[i]
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
            mcols.append(inb.astype(jnp.float32))
        mask_col = jnp.concatenate(mcols, axis=0)  # [nv, 1]
    if fold_pos_code:
        # build the 63-ch pts embedding in VMEM from the sample positions
        # (already streamed for fold_ray_diff) via the double-angle octave
        # recurrence — drops the [R, S, 2*POSENC] bf16 HBM stream; the
        # per-ray view embedding arrives as a tiny [rb, POSENC] input
        pparts = [xyz]
        ps, pc = jnp.sin(xyz), jnp.cos(xyz)
        for _ in range(10):
            pparts.append(ps)
            pparts.append(pc)
            ps, pc = 2.0 * ps * pc, pc * pc - ps * ps
        pts_code = jnp.concatenate(pparts, axis=-1)  # [ns, POSENC]
        vc = pos_code_ref[:].astype(jnp.float32)     # [rb, 1, POSENC]
        vc_b = jnp.broadcast_to(
            vc, (rb, s, POSENC)
        ).reshape(ns, POSENC)
        pos_code = jnp.concatenate(
            [pts_code, vc_b], axis=-1
        ).astype(dtype)                              # [ns, 2*POSENC]
    else:
        pos_code = pos_code_ref[:].reshape(ns, 2 * POSENC).astype(dtype)

    def vslice(x, i):
        return x[i * ns : (i + 1) * ns]

    cnt = vslice(mask_col, 0)
    for i in range(1, v):
        cnt = cnt + vslice(mask_col, i)
    all_invalid = cnt == 0.0
    view_bias = jnp.where(
        (mask_col == 0.0) & (~jnp.concatenate([all_invalid] * v, axis=0)),
        NEG,
        0.0,
    )

    h = _dense(rgb_feat, next_w(), next_w())
    h = _dense(jax.nn.relu(h), next_w(), next_w())  # [nv, NW]

    # ---- cross-block precompute: 3 wide matmuls over all 8 blocks -------
    kp_all = _dense(h, next_w())                       # [nv, DEPTH*NW]
    vp_all = _dense(h, next_w())                       # [nv, DEPTH*NW]
    pos_in = jax.nn.relu(_dense(ray_diff, next_w(), next_w()))  # [nv, D*PH]
    pos_all = _dense(pos_in, next_w(), next_w())       # [nv, DEPTH*NW]

    q = vslice(h, 0)
    for i in range(1, v):
        q = jnp.maximum(q, vslice(h, i))

    weights_out = None
    for blk in range(DEPTH):
        bsl = slice(blk * NW, (blk + 1) * NW)
        kp = kp_all[:, bsl]
        vp = vp_all[:, bsl]
        pos = pos_all[:, bsl]

        an_s, an_b = next_w(), next_w()
        x = _layernorm(q, an_s, an_b, 1e-6)
        qp = _dense(x, next_w())
        w_a0, b_a0 = next_w(), next_w()
        w_a1, b_a1 = next_w(), next_w()
        # NOTE: a "bottleneck-first" rewrite (project kp/pos/qp through the
        # 8-wide attn_fc_0 before combining, bf16 softmax) measured 17%
        # SLOWER (360 vs 307 ms/tile) — the extra narrow matmul issues cost
        # more than the saved full-width elementwise passes. Keep this form.
        qtile = jnp.concatenate([qp] * v, axis=0)
        lg = _dense(
            jax.nn.relu(_dense(kp - qtile + pos, w_a0, b_a0)), w_a1, b_a1
        )
        lg = lg.astype(jnp.float32) + view_bias
        val = (vp + pos).astype(jnp.float32)

        mx = vslice(lg, 0)
        for i in range(1, v):
            mx = jnp.maximum(mx, vslice(lg, i))
        den = jnp.zeros((ns, NW), jnp.float32)
        agg = jnp.zeros((ns, NW), jnp.float32)
        for i in range(v):
            ex = jnp.exp(vslice(lg, i) - mx)
            den = den + ex
            agg = agg + ex * vslice(val, i)
        agg = (agg / den).astype(dtype)

        agg = _dense(agg, next_w(), next_w())
        x = agg + q
        fn_s, fn_b = next_w(), next_w()
        y = _layernorm(x, fn_s, fn_b, 1e-6)
        y = _dense(jax.nn.relu(_dense(y, next_w(), next_w())), next_w(), next_w())
        q = y + x

        if blk % 2 == 0:
            qcat = jnp.concatenate([q, pos_code], axis=-1)
            q = _dense(qcat, next_w(), next_w())
            q = _dense(jax.nn.relu(q), next_w(), next_w())

        an_s, an_b = next_w(), next_w()
        xr = _layernorm(q, an_s, an_b, 1e-6)
        mcat = next_w()
        pcat = next_w()
        bo = next_w()
        z = _dense(xr, mcat)
        pm = _dense(xr, pcat)
        x3 = xr.reshape(rb, s, NW)

        acc = None
        w_acc = None
        for hh in range(HEADS):
            sl = slice(hh * NW, (hh + 1) * NW)
            z3 = z[:, sl].reshape(rb, s, NW)
            lgh = jax.lax.dot_general(
                z3, x3,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            lgh = lgh - jnp.max(lgh, axis=-1, keepdims=True)
            exh = jnp.exp(lgh)
            attn = exh / jnp.sum(exh, axis=-1, keepdims=True)
            p3 = pm[:, sl].reshape(rb, s, NW)
            outh = jax.lax.dot_general(
                attn.astype(dtype), p3,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            acc = outh if acc is None else acc + outh
            fr = attn[:, 0:1, :]
            w_acc = fr if w_acc is None else w_acc + fr
        out = (acc + bo.astype(jnp.float32)).astype(dtype).reshape(ns, NW)
        xq = q + out
        fn_s, fn_b = next_w(), next_w()
        y = _layernorm(xq, fn_s, fn_b, 1e-6)
        y = _dense(jax.nn.relu(_dense(y, next_w(), next_w())), next_w(), next_w())
        q = xq + y

        weights_out = w_acc / HEADS

    hq = _layernorm(q, next_w(), next_w(), 1e-6)
    pooled = jnp.mean(hq.reshape(rb, s, NW).astype(jnp.float32), axis=1)
    rgb = _dense(pooled.astype(dtype), next_w(), next_w())

    rgb_out_ref[0] = rgb.astype(jnp.float32)
    w_out_ref[0] = weights_out.astype(jnp.float32)
    # attention-weighted valid-view count per ray (renderer's inbound_cnt
    # when the validity mask == the inbound mask, i.e. gnt_use_dyn_mask off;
    # saves the XLA-side [V, R, S] reduction chain — static_gnt.py:220-229)
    wout2 = weights_out[:, 0, :].astype(jnp.float32)     # [rb, s]
    cnt_rs = cnt.reshape(rb, s)                          # tiny relayout
    cnt_out_ref[0] = jnp.sum(wout2 * cnt_rs, axis=-1, keepdims=True) * (
        1.0 / v
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "ray_block", "interpret", "views_outer", "separate_mask",
        "fold_pos_code", "fold_lerp", "fold_mask_hw",
    ),
)
def gnt_fused_apply_mono3(
    gnt_params,
    rgb_feat,
    ray_diff,
    mask,
    pts_code,
    view_code,
    ray_block: int = 8,
    interpret: bool = False,
    views_outer: bool = False,
    pts=None,
    cam_centers=None,
    separate_mask: bool = False,
    fold_pos_code: bool = False,
    fold_lerp: bool = False,
    frac=None,
    fold_mask_hw=None,
    proj_mats=None,
):
    """Contract of ``gnt_fused_apply_mono2`` (incl. the fold_ray_diff path:
    pass ray_diff=None with pts + cam_centers, and the pre-packed path:
    mask=None with the validity channel already trailing rgb_feat), plus:

    separate_mask=True: rgb_feat ([*, feat_in], no mask channel) and mask
    ([*, 1]) are passed to the kernel as SEPARATE inputs — no XLA-side
    concat copy at all (the concat was a ~30 ms/tile kLoop fusion at bench
    scale, scripts/hlo_dump_exp.py).

    fold_mask_hw=(H, W) with proj_mats [V, 3, 4] (rows of K @ w2c,
    cameras.flat_cam_projection): NO mask operand at all — the kernel
    recomputes the inbound & in-front validity from the sample positions
    (requires the fold_ray_diff path: ray_diff=None, pts + cam_centers).
    rgb_feat carries no mask channel, like separate_mask.

    Returns {rgb [R, 3], weights [R, S], inbound_cnt_raw [R]} where
    inbound_cnt_raw = sum_s weights * (valid views / V) — equals the
    renderer's inbound_cnt whenever validity == inbound (dyn mask off).
    """
    fold_mask = fold_mask_hw is not None
    if fold_mask:
        if mask is not None or separate_mask:
            raise ValueError("fold_mask_hw excludes mask/separate_mask")
        if ray_diff is not None or proj_mats is None:
            raise ValueError(
                "fold_mask_hw requires the fold_ray_diff path + proj_mats"
            )
    pre_packed = mask is None and not fold_mask
    if views_outer:
        v, r, s, feat_ch = rgb_feat.shape
    else:
        r, s, v, feat_ch = rgb_feat.shape
    if fold_lerp:
        # rgb_feat = raw quad rows [V, R, S, 4*C] + frac offsets
        if not ((separate_mask or fold_mask) and views_outer and frac is not None):
            raise ValueError(
                "fold_lerp requires separate_mask|fold_mask + views_outer + frac"
            )
        feat_in = feat_ch // 4
    else:
        feat_in = (
            feat_ch - 1 if (pre_packed and not separate_mask) else feat_ch
        )
    if r % ray_block != 0:
        raise ValueError(f"rays {r} not divisible by ray_block {ray_block}")
    fold_ray_diff = ray_diff is None
    if fold_ray_diff:
        assert pts is not None and cam_centers is not None
    if separate_mask and mask is None:
        raise ValueError("separate_mask requires an explicit mask input")
    weights = flatten_gnt_params_mono3(gnt_params)
    grid = (r // ray_block,)

    if separate_mask or pre_packed or fold_mask:
        packed = rgb_feat.astype(jnp.bfloat16)
    else:
        packed = jnp.concatenate(
            [rgb_feat.astype(jnp.bfloat16), mask.astype(jnp.bfloat16)],
            axis=-1,
        )
    if not views_outer:
        packed = jnp.transpose(packed, (2, 0, 1, 3))
    mask_t = None
    if separate_mask:
        mask_t = mask.astype(jnp.bfloat16)
        if not views_outer:
            mask_t = jnp.transpose(mask_t, (2, 0, 1, 3))
    if fold_ray_diff:
        rd_t = pts.astype(jnp.float32)
        rd_spec = pl.BlockSpec(
            (ray_block, s, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        rd_t = (
            ray_diff.astype(jnp.bfloat16)
            if views_outer
            else jnp.transpose(ray_diff.astype(jnp.bfloat16), (2, 0, 1, 3))
        )
        rd_spec = pl.BlockSpec(
            (v, ray_block, s, 4), lambda i: (0, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    if fold_pos_code:
        if not fold_ray_diff:
            raise ValueError("fold_pos_code requires the fold_ray_diff path")
        # per-ray view embedding only; pts embedding is built in-kernel.
        # [r, 1, POSENC] so the block's last two dims equal the array dims
        # (Mosaic's block-shape divisibility rule with ray_block < 8)
        pos_code = view_code.astype(jnp.bfloat16)[:, None, :]
        pos_spec = pl.BlockSpec(
            (ray_block, 1, POSENC), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        pos_code = jnp.concatenate(
            [pts_code, jnp.broadcast_to(view_code[:, None, :], pts_code.shape)],
            axis=-1,
        ).astype(jnp.bfloat16)
        pos_spec = pl.BlockSpec(
            (ray_block, s, 2 * POSENC), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    if fold_lerp:
        first_ch = 4 * feat_in
    elif separate_mask or fold_mask:
        first_ch = feat_in
    else:
        first_ch = feat_in + 1
    in_specs = [
        pl.BlockSpec(
            (v, ray_block, s, first_ch),
            lambda i: (0, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [packed]
    if separate_mask:
        in_specs.append(
            pl.BlockSpec(
                (v, ray_block, s, 1),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(mask_t)
    if fold_lerp:
        in_specs.append(
            pl.BlockSpec(
                (v, ray_block, s, 2),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(frac.astype(jnp.float32))
    in_specs += [rd_spec, pos_spec]
    operands += [rd_t, pos_code]
    if fold_ray_diff:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(jnp.asarray(cam_centers, jnp.float32))
    if fold_mask:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(jnp.asarray(proj_mats, jnp.float32)[:, :3, :])
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    operands += weights

    rgb, w, cnt = pl.pallas_call(
        functools.partial(
            _gnt_kernel3, ray_block, s, v, feat_in, fold_ray_diff,
            separate_mask, fold_pos_code, fold_lerp, fold_mask_hw,
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
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    return {
        "rgb": rgb.reshape(r, 3),
        "weights": w.reshape(r, s),
        "inbound_cnt_raw": cnt.reshape(r),
    }
