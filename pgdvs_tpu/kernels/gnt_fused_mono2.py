"""Monolithic fused GNT transformer, v2 — MXU-shape-restructured.

Same contract as ``gnt_fused_mono`` (all 8 blocks + rgb head in ONE Pallas
kernel per ray block), with two structural changes targeting the measured
bottlenecks (STATUS round 2: ray attention capped at 12.5% MXU by its
[*, 256, 16] per-head shapes; view side at ~50% by 64-wide contractions,
with per-instruction overhead from ~60 small matmuls per block):

1. **Hoisted view side**: every matmul of the view transformer runs ONCE on
   the full views-outer token tensor ([v*rb*s, C]) instead of v times on
   [rb*s, C] slices — 10x fewer MXU instructions per block. Only the masked
   view softmax remains a per-view slice loop, and it is pure VPU work
   (exp/max/fma on [rb*s, C]).

2. **Folded ray attention**: the per-head Q/K and V/out projections are
   folded at weight-flatten time into
       M_h = W_q,h @ W_k,h^T / sqrt(hd)        (QK^T == x M_h x^T)
       P_h = W_v,h @ W_o[h]                     (out == sum_h A_h (x P_h))
   so the kernel computes logits with a 64-deep contraction and the
   attention-value product with a 64-wide output. On the MXU both are FREE
   upgrades: a [256, 16] operand pads to the same 128-deep/128-wide tile
   passes as a [256, 64] one, so the folded form does 4x the useful work in
   the same number of passes and drops the separate q/k/v/out projections
   entirely (12 -> 10 dots per block, all full-width).

Numerics: folding is computed in f32 and rounds to bf16 once; everything
else matches ``gnt_fused_mono`` (bf16 compute, f32 layernorm stats and
softmax). Parity vs ``GNT.apply`` is covered by tests/test_gnt_fused.py.

Reference behavior anchor: transformer_network.py:341-539 (see
``pgdvs_tpu.models.gnt.network``).
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pgdvs_tpu.kernels.gnt_fused_mono import _pair_slot_names

NW = 64  # netwidth
DEPTH = 8
HEADS = 4
POSENC = 63  # 3 + 3*2*10
NEG = -1e30


def flatten_gnt_params_mono2(gnt_params) -> List[jnp.ndarray]:
    """Flax GNT params -> flat weight list with folded ray attention.

    Same traversal as ``flatten_gnt_params_mono`` except each ray
    transformer's (q_fc, k_fc, v_fc, out_fc) quartet is replaced by
    (Mcat [NW, HEADS*NW], Pcat [NW, HEADS*NW], out_bias [NW]).
    """
    p = gnt_params["params"]
    out = [
        p["rgbfeat_fc_0"]["kernel"], p["rgbfeat_fc_0"]["bias"],
        p["rgbfeat_fc_1"]["kernel"], p["rgbfeat_fc_1"]["bias"],
    ]
    bp = p["block_pairs"]

    def get(path, pair_idx):
        cur = bp
        for k in path:
            cur = cur[k]
        return cur[pair_idx]

    hd = NW // HEADS
    for pair in range(DEPTH // 2):
        for slot in ("a", "b"):
            rt = f"ray_trans_{slot}"
            for path in _pair_slot_names(slot):
                if path[0] == rt and path[1] == "attn":
                    # consume the quartet once, at the q_fc position
                    if path[2] == "q_fc":
                        wq = get((rt, "attn", "q_fc", "kernel"), pair)
                        wk = get((rt, "attn", "k_fc", "kernel"), pair)
                        wv = get((rt, "attn", "v_fc", "kernel"), pair)
                        wo = get((rt, "attn", "out_fc", "kernel"), pair)
                        bo = get((rt, "attn", "out_fc", "bias"), pair)
                        ms, ps = [], []
                        for h in range(HEADS):
                            sl = slice(h * hd, (h + 1) * hd)
                            wq_h = wq[:, sl].astype(jnp.float32)
                            wk_h = wk[:, sl].astype(jnp.float32)
                            wv_h = wv[:, sl].astype(jnp.float32)
                            wo_h = wo[sl, :].astype(jnp.float32)
                            ms.append(wq_h @ wk_h.T / np.sqrt(hd))
                            ps.append(wv_h @ wo_h)
                        out.append(jnp.concatenate(ms, axis=-1))
                        out.append(jnp.concatenate(ps, axis=-1))
                        out.append(bo)
                    continue
                out.append(get(path, pair))
                if (
                    slot == "a"
                    and path == ("view_trans_a", "ff", "fc2", "bias")
                ):
                    out.append(get(("q_fc_0", "kernel"), pair))
                    out.append(get(("q_fc_0", "bias"), pair))
                    out.append(get(("q_fc_1", "kernel"), pair))
                    out.append(get(("q_fc_1", "bias"), pair))
    out.append(p["norm"]["scale"])
    out.append(p["norm"]["bias"])
    out.append(p["rgb_fc"]["kernel"])
    out.append(p["rgb_fc"]["bias"])
    return [jnp.asarray(w).astype(jnp.bfloat16) for w in out]


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


def _gnt_kernel2(
    rb: int,
    s: int,
    v: int,
    feat_in: int,
    ablate: str,
    fold_ray_diff: bool,
    rf_ref,       # [v, rb, s, feat_in + 1]  (last channel = validity mask)
    rd_ref,       # [v, rb, s, 4] — or, with fold_ray_diff, pts [rb, s, 3]
    pos_code_ref, # [rb, s, 2*POSENC]
    *rest,
):
    if fold_ray_diff:
        centers_ref = rest[0]  # [v + 1, 3] camera centers (target first)
        rest = rest[1:]
    weight_refs = rest[:-2]
    rgb_out_ref, w_out_ref = rest[-2:]
    widx = [0]

    def next_w():
        w = weight_refs[widx[0]][:]
        widx[0] += 1
        return w

    dtype = jnp.bfloat16
    ns = rb * s
    nv = v * ns

    packed = rf_ref[:].reshape(nv, feat_in + 1)  # views outer
    rgb_feat = packed[:, :feat_in].astype(dtype)
    mask_col = packed[:, feat_in:].astype(jnp.float32)  # [nv, 1]
    if fold_ray_diff:
        # compute the 4-channel ray-difference code in-kernel from sample
        # positions + camera centers (cameras.ray_diff_features) — skips
        # the XLA-side [V, R, S, 4] materialization + HBM round trip
        eps = 1e-6
        xyz = rd_ref[:].reshape(ns, 3).astype(jnp.float32)
        centers = centers_ref[:]

        def unit(x):  # cameras.ray_diff_features eps semantics
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
                jnp.concatenate(
                    [diff / jnp.maximum(dn, eps), dot], axis=-1
                )
            )
        ray_diff = jnp.concatenate(rd_rows, axis=0).astype(dtype)  # [nv, 4]
    else:
        ray_diff = rd_ref[:].reshape(nv, 4).astype(dtype)
    pos_code = pos_code_ref[:].reshape(ns, 2 * POSENC).astype(dtype)

    def vslice(x, i):
        return x[i * ns : (i + 1) * ns]

    # all-invalid fallback: rows with zero valid views attend un-masked
    cnt = vslice(mask_col, 0)
    for i in range(1, v):
        cnt = cnt + vslice(mask_col, i)
    all_invalid = cnt == 0.0  # [ns, 1]

    # per-view -inf softmax bias, stacked views-outer: [nv, 1]
    view_bias = jnp.where(
        (mask_col == 0.0)
        & (~jnp.concatenate([all_invalid] * v, axis=0)),
        NEG,
        0.0,
    )

    # rgbfeat_fc
    h = _dense(rgb_feat, next_w(), next_w())
    h = _dense(jax.nn.relu(h), next_w(), next_w())  # [nv, NW]

    q = vslice(h, 0)
    for i in range(1, v):
        q = jnp.maximum(q, vslice(h, i))  # maxpool over views: [ns, NW]

    weights_out = None
    for blk in range(DEPTH):
        # ---- view transformer: hoisted matmuls + per-view VPU softmax ----
        an_s, an_b = next_w(), next_w()
        x = _layernorm(q, an_s, an_b, 1e-6)  # [ns, NW]
        qp = _dense(x, next_w())
        kp = _dense(h, next_w())             # ALL views at once: [nv, NW]
        vp = _dense(kp, next_w())
        w_p0, b_p0 = next_w(), next_w()
        w_p1, b_p1 = next_w(), next_w()
        pos = _dense(jax.nn.relu(_dense(ray_diff, w_p0, b_p0)), w_p1, b_p1)
        w_a0, b_a0 = next_w(), next_w()
        w_a1, b_a1 = next_w(), next_w()
        if ablate not in ("no_view", "min"):
            qtile = jnp.concatenate([qp] * v, axis=0)  # [nv, NW] sublanes
            lg = _dense(
                jax.nn.relu(_dense(kp - qtile + pos, w_a0, b_a0)), w_a1, b_a1
            )
            lg = lg.astype(jnp.float32) + view_bias  # [nv, NW]
            val = (vp + pos).astype(jnp.float32)

            # masked softmax over views: VPU-only slice loop
            mx = vslice(lg, 0)
            for i in range(1, v):
                mx = jnp.maximum(mx, vslice(lg, i))
            den = jnp.zeros((ns, NW), jnp.float32)
            agg = jnp.zeros((ns, NW), jnp.float32)
            for i in range(v):
                ex = jnp.exp(vslice(lg, i) - mx)
                den = den + ex
                agg = agg + ex * vslice(val, i)
            agg = (agg / den).astype(dtype)  # [ns, NW]
        else:
            agg = qp + vslice(vp, 0) + vslice(pos, 0)  # keep deps, no attn

        agg = _dense(agg, next_w(), next_w())
        x = agg + q
        fn_s, fn_b = next_w(), next_w()
        y = _layernorm(x, fn_s, fn_b, 1e-6)
        y = _dense(jax.nn.relu(_dense(y, next_w(), next_w())), next_w(), next_w())
        q = y + x

        # ---- positional q_fc on even blocks -----------------------------
        if blk % 2 == 0:
            qcat = jnp.concatenate([q, pos_code], axis=-1)
            q = _dense(qcat, next_w(), next_w())
            q = _dense(jax.nn.relu(q), next_w(), next_w())

        # ---- folded ray transformer -------------------------------------
        an_s, an_b = next_w(), next_w()
        xr = _layernorm(q, an_s, an_b, 1e-6)    # [ns, NW]
        mcat = next_w()                          # [NW, HEADS*NW]
        pcat = next_w()                          # [NW, HEADS*NW]
        bo = next_w()                            # [NW]
        if ablate in ("no_ray", "min"):
            q = q + _dense(xr, mcat)[:, :NW] + _dense(xr, pcat)[:, :NW]
            weights_out = jnp.zeros((rb, 1, s), jnp.float32) + q[
                0:1, 0:1
            ].astype(jnp.float32)
            for _ in range(6):
                next_w()  # consume ff_norm + ff weights
            continue
        z = _dense(xr, mcat)                     # [ns, HEADS*NW]
        pm = _dense(xr, pcat)                    # [ns, HEADS*NW]
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
            )  # [rb, s, s], 64-deep contraction
            if ablate == "no_softmax":
                attn = lgh * (1.0 / s)
            else:
                lgh = lgh - jnp.max(lgh, axis=-1, keepdims=True)
                exh = jnp.exp(lgh)
                attn = exh / jnp.sum(exh, axis=-1, keepdims=True)
            p3 = pm[:, sl].reshape(rb, s, NW)
            outh = jax.lax.dot_general(
                attn.astype(dtype), p3,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [rb, s, NW], 64-wide output
            acc = outh if acc is None else acc + outh
            fr = attn[:, 0:1, :]  # [rb, 1, s] first-query row
            w_acc = fr if w_acc is None else w_acc + fr
        out = (acc + bo.astype(jnp.float32)).astype(dtype).reshape(ns, NW)
        xq = q + out
        fn_s, fn_b = next_w(), next_w()
        y = _layernorm(xq, fn_s, fn_b, 1e-6)
        y = _dense(jax.nn.relu(_dense(y, next_w(), next_w())), next_w(), next_w())
        q = xq + y

        weights_out = w_acc / HEADS  # [rb, 1, s]

    hq = _layernorm(q, next_w(), next_w(), 1e-6)
    pooled = jnp.mean(hq.reshape(rb, s, NW).astype(jnp.float32), axis=1)
    rgb = _dense(pooled.astype(dtype), next_w(), next_w())  # [rb, 3]

    rgb_out_ref[0] = rgb.astype(jnp.float32)
    w_out_ref[0] = weights_out.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("ray_block", "interpret", "views_outer", "ablate"),
)
def gnt_fused_apply_mono2(
    gnt_params,
    rgb_feat,
    ray_diff,
    mask,
    pts_code,
    view_code,
    ray_block: int = 8,
    interpret: bool = False,
    views_outer: bool = False,
    ablate: str = "",   # perf-bisection only: no_view | no_ray | no_softmax | min
    pts=None,           # [R, S, 3] sample positions (fold_ray_diff path)
    cam_centers=None,   # [V + 1, 3] camera centers, target first
):
    """Run the restructured fused GNT transformer (contract of
    ``gnt_fused_apply_mono``). Returns {rgb [R, 3], weights [R, S]} (f32).

    When ``pts`` + ``cam_centers`` are given (and ray_diff is None), the
    ray-difference code is computed inside the kernel instead of being
    streamed as a [V, R, S, 4] input. When ``mask`` is None, ``rgb_feat``
    must already carry the validity mask as its trailing channel (the
    sampler's pack_mask output) — skips a full-tensor concat copy.
    """
    pre_packed = mask is None
    if views_outer:
        v, r, s, feat_ch = rgb_feat.shape
    else:
        r, s, v, feat_ch = rgb_feat.shape
    feat_in = feat_ch - 1 if pre_packed else feat_ch
    if r % ray_block != 0:
        raise ValueError(f"rays {r} not divisible by ray_block {ray_block}")
    fold_ray_diff = ray_diff is None
    if fold_ray_diff:
        assert pts is not None and cam_centers is not None
    weights = flatten_gnt_params_mono2(gnt_params)
    grid = (r // ray_block,)

    if pre_packed:
        packed = rgb_feat.astype(jnp.bfloat16)
    else:
        packed = jnp.concatenate(
            [rgb_feat.astype(jnp.bfloat16), mask.astype(jnp.bfloat16)],
            axis=-1,
        )
    if not views_outer:
        packed = jnp.transpose(packed, (2, 0, 1, 3))  # [V, R, S, F+1]
    if fold_ray_diff:
        rd_t = pts.astype(jnp.float32)  # [R, S, 3]
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
    pos_code = jnp.concatenate(
        [pts_code, jnp.broadcast_to(view_code[:, None, :], pts_code.shape)],
        axis=-1,
    ).astype(jnp.bfloat16)

    in_specs = [
        pl.BlockSpec(
            (v, ray_block, s, feat_in + 1),
            lambda i: (0, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        rd_spec,
        pl.BlockSpec(
            (ray_block, s, 2 * POSENC), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    extra = []
    if fold_ray_diff:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        extra.append(jnp.asarray(cam_centers, jnp.float32))
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]

    rgb, w = pl.pallas_call(
        functools.partial(
            _gnt_kernel2, ray_block, s, v, feat_in, ablate, fold_ray_diff
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
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid[0], ray_block, 3), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], ray_block, 1, s), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(packed, rd_t, pos_code, *extra, *weights)
    return {
        "rgb": rgb.reshape(r, 3),
        "weights": w.reshape(r, s),
    }
