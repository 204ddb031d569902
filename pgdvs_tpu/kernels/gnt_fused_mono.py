"""Monolithic fused GNT transformer — one Pallas kernel per ray block.

Round-1 design kept as the fast path: all 8 blocks + heads run inside ONE
kernel launch per grid step (per-view small matmuls + flash-style online
view softmax). Compiles in minutes on this backend (unlike the
views-batched tall-matmul variants, whose Mosaic compiles are pathological)
and pipelines best at runtime; `pgdvs_tpu.kernels.gnt_fused` holds the
split view/ray kernels that compile in seconds (used on fresh caches /
ablations).

The XLA version of the depth-8 GNT materializes every [rays, samples, views,
64] intermediate in HBM (~15 passes x 0.7GB per block per tile), making the
transformer HBM-bound at ~28 s per 288x550 view. This kernel keeps a block
of rays resident in VMEM through ALL 8 transformer blocks + the rgb head:
HBM traffic collapses to reading the epipolar inputs once and writing
[rgb, weights] once.

Matches `pgdvs_tpu.models.gnt.network.GNT` (depth 8, width 64, bf16) —
`flatten_gnt_params` adapts the flax param tree (scanned pair layout) into
the kernel's flat weight list, and the unit test checks numerical agreement
against `GNT.apply`.

Mosaic-layout design notes (the kernel compiles on real Mosaic, which
rejects most mixed reshapes):
  * token tensors live in 2D [views * rays * samples, C] with views OUTER;
    per-view slices are STATIC sublane slices, so all cross-view reductions
    (masked softmax, maxpool) are unrolled slice arithmetic — no
    [ns, V, C] 3D tensors, no repeats (query broadcast = sublane concat);
  * the validity mask rides as an extra input channel of rgb_feat, so the
    per-token -inf bias is a lane slice, never a lanes->sublanes relayout;
  * ray attention runs per head with lane slices + single-batch-dim
    dot_general (Mosaic supports at most one batch dim);
  * the per-sample weights output keeps its singleton axis ([R, 1, S]) to
    avoid an unsupported squeeze-reshape; callers squeeze in XLA.
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NW = 64  # netwidth
DEPTH = 8
HEADS = 4
POSENC = 63  # 3 + 3*2*10
NEG = -1e30


# ordered weight names per transformer block (a or b slot of a pair)
def _pair_slot_names(slot: str):
    vt = f"view_trans_{slot}"
    rt = f"ray_trans_{slot}"
    names = [
        (vt, "attn_norm", "scale"), (vt, "attn_norm", "bias"),
        (vt, "attn", "q_fc", "kernel"),
        (vt, "attn", "k_fc", "kernel"),
        (vt, "attn", "v_fc", "kernel"),
        (vt, "attn", "pos_fc_0", "kernel"), (vt, "attn", "pos_fc_0", "bias"),
        (vt, "attn", "pos_fc_1", "kernel"), (vt, "attn", "pos_fc_1", "bias"),
        (vt, "attn", "attn_fc_0", "kernel"), (vt, "attn", "attn_fc_0", "bias"),
        (vt, "attn", "attn_fc_1", "kernel"), (vt, "attn", "attn_fc_1", "bias"),
        (vt, "attn", "out_fc", "kernel"), (vt, "attn", "out_fc", "bias"),
        (vt, "ff_norm", "scale"), (vt, "ff_norm", "bias"),
        (vt, "ff", "fc1", "kernel"), (vt, "ff", "fc1", "bias"),
        (vt, "ff", "fc2", "kernel"), (vt, "ff", "fc2", "bias"),
        (rt, "attn_norm", "scale"), (rt, "attn_norm", "bias"),
        (rt, "attn", "q_fc", "kernel"),
        (rt, "attn", "k_fc", "kernel"),
        (rt, "attn", "v_fc", "kernel"),
        (rt, "attn", "out_fc", "kernel"), (rt, "attn", "out_fc", "bias"),
        (rt, "ff_norm", "scale"), (rt, "ff_norm", "bias"),
        (rt, "ff", "fc1", "kernel"), (rt, "ff", "fc1", "bias"),
        (rt, "ff", "fc2", "kernel"), (rt, "ff", "fc2", "bias"),
    ]
    return names


def flatten_gnt_params_mono(gnt_params) -> List[jnp.ndarray]:
    """Flax GNT params (scanned-pair layout) -> flat kernel weight list.

    Order: rgbfeat_fc_0 W/b, rgbfeat_fc_1 W/b, then per torch-block i
    (0..7): view+ray transformer weights (+ q_fc W/b pairs after even
    blocks' view transformer), then final norm scale/bias, rgb_fc W/b.
    """
    p = gnt_params["params"]
    out = [
        p["rgbfeat_fc_0"]["kernel"], p["rgbfeat_fc_0"]["bias"],
        p["rgbfeat_fc_1"]["kernel"], p["rgbfeat_fc_1"]["bias"],
    ]
    bp = p["block_pairs"]

    def get(tree, path, pair_idx):
        cur = tree
        for k in path:
            cur = cur[k]
        return cur[pair_idx]

    for pair in range(DEPTH // 2):
        for slot in ("a", "b"):
            names = _pair_slot_names(slot)
            emitted_qfc = False
            for path in names:
                out.append(get(bp, path, pair))
                if (
                    slot == "a"
                    and not emitted_qfc
                    and path == ("view_trans_a", "ff", "fc2", "bias")
                ):
                    out.append(get(bp, ("q_fc_0", "kernel"), pair))
                    out.append(get(bp, ("q_fc_0", "bias"), pair))
                    out.append(get(bp, ("q_fc_1", "kernel"), pair))
                    out.append(get(bp, ("q_fc_1", "bias"), pair))
                    emitted_qfc = True
    out.append(p["norm"]["scale"])
    out.append(p["norm"]["bias"])
    out.append(p["rgb_fc"]["kernel"])
    out.append(p["rgb_fc"]["bias"])
    # bf16 weights: halves the (double-buffered) VMEM weight footprint; the
    # kernel computes in bf16 anyway and layernorm stats stay f32
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


def _gnt_kernel(
    rb: int,
    s: int,
    v: int,
    feat_in: int,
    rf_ref,       # [v, rb, s, feat_in + 1]  (last channel = validity mask)
    rd_ref,       # [v, rb, s, 4]
    pos_code_ref, # [rb, s, 2*POSENC]
    *rest,
):
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
    ray_diff = rd_ref[:].reshape(nv, 4).astype(dtype)
    pos_code = pos_code_ref[:].reshape(ns, 2 * POSENC).astype(dtype)

    def vslice(x, i):
        return x[i * ns : (i + 1) * ns]

    # all-invalid fallback: rows with zero valid views attend un-masked
    cnt = vslice(mask_col, 0)
    for i in range(1, v):
        cnt = cnt + vslice(mask_col, i)
    all_invalid = cnt == 0.0  # [ns, 1]

    def view_bias(i):
        m = vslice(mask_col, i)
        return jnp.where((m == 0.0) & (~all_invalid), NEG, 0.0)  # [ns, 1] f32

    # rgbfeat_fc
    h = _dense(rgb_feat, next_w(), next_w())
    h = _dense(jax.nn.relu(h), next_w(), next_w())  # [nv, NW]

    q = vslice(h, 0)
    for i in range(1, v):
        q = jnp.maximum(q, vslice(h, i))  # maxpool over views: [ns, NW]

    weights_out = None
    for blk in range(DEPTH):
        # ---- view transformer: per-view online softmax -------------------
        # (flash-attention style single pass, so besides `h` no [nv, NW]
        #  tensor is ever live — the VMEM budget is what bounds ray_block)
        an_s, an_b = next_w(), next_w()
        x = _layernorm(q, an_s, an_b, 1e-6)  # [ns, NW]
        qp = _dense(x, next_w())
        w_k = next_w()
        w_v = next_w()
        w_p0, b_p0 = next_w(), next_w()
        w_p1, b_p1 = next_w(), next_w()
        w_a0, b_a0 = next_w(), next_w()
        w_a1, b_a1 = next_w(), next_w()

        mx = jnp.full((ns, NW), NEG, jnp.float32)
        den = jnp.zeros((ns, NW), jnp.float32)
        agg = jnp.zeros((ns, NW), jnp.float32)
        for i in range(v):
            kp_i = _dense(vslice(h, i), w_k)
            vp_i = _dense(kp_i, w_v)
            pos_i = _dense(vslice(ray_diff, i), w_p0, b_p0)
            pos_i = _dense(jax.nn.relu(pos_i), w_p1, b_p1)
            lg_i = kp_i - qp + pos_i
            lg_i = _dense(lg_i, w_a0, b_a0)
            lg_i = _dense(jax.nn.relu(lg_i), w_a1, b_a1)
            lg_i = lg_i.astype(jnp.float32) + view_bias(i)
            m_new = jnp.maximum(mx, lg_i)
            scale = jnp.exp(mx - m_new)
            ex = jnp.exp(lg_i - m_new)
            den = den * scale + ex
            agg = agg * scale + ex * (vp_i + pos_i).astype(jnp.float32)
            mx = m_new
        agg = (agg / den).astype(dtype)  # [ns, NW]

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

        # ---- ray transformer (per-head, single batch dim) ---------------
        an_s, an_b = next_w(), next_w()
        xr = _layernorm(q, an_s, an_b, 1e-6)
        hd = NW // HEADS
        qf = _dense(xr, next_w())
        kf = _dense(xr, next_w())
        vf = _dense(xr, next_w())

        head_outs = []
        w_acc = None
        for hh in range(HEADS):
            sl = slice(hh * hd, (hh + 1) * hd)
            q3 = qf[:, sl].reshape(rb, s, hd)
            k3 = kf[:, sl].reshape(rb, s, hd)
            v3 = vf[:, sl].reshape(rb, s, hd)
            lgh = jax.lax.dot_general(
                q3, k3,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) / np.sqrt(hd)  # [rb, s, s]
            lgh = lgh - jnp.max(lgh, axis=-1, keepdims=True)
            exh = jnp.exp(lgh)
            attn = exh / jnp.sum(exh, axis=-1, keepdims=True)
            outh = jax.lax.dot_general(
                attn.astype(dtype), v3,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)  # [rb, s, hd]
            head_outs.append(outh.reshape(ns, hd))
            fr = attn[:, 0:1, :]  # [rb, 1, s] first-query row
            w_acc = fr if w_acc is None else w_acc + fr
        out = jnp.concatenate(head_outs, axis=-1)  # [ns, NW]
        out = _dense(out, next_w(), next_w())
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
    jax.jit, static_argnames=("ray_block", "interpret", "views_outer")
)
def gnt_fused_apply_mono(
    gnt_params,
    rgb_feat,
    ray_diff,
    mask,
    pts_code,
    view_code,
    ray_block: int = 8,
    interpret: bool = False,
    views_outer: bool = False,
):
    """Run the fused GNT transformer.

    Args:
      gnt_params: the flax GNT param tree ({'params': ...}).
      rgb_feat: [R, S, V, 3+F]; ray_diff: [R, S, V, 4]; mask: [R, S, V, 1];
      pts_code: [R, S, 63]; view_code: [R, 63] (sinusoidal encodings).

    Returns dict {rgb [R, 3], weights [R, S]} (f32).
    """
    if views_outer:
        v, r, s, feat_in = rgb_feat.shape
    else:
        r, s, v, feat_in = rgb_feat.shape
    if r % ray_block != 0:
        raise ValueError(f"rays {r} not divisible by ray_block {ray_block}")
    weights = flatten_gnt_params_mono(gnt_params)
    grid = (r // ray_block,)

    # views-outer packing with the mask as the last channel (see module doc)
    packed = jnp.concatenate(
        [rgb_feat.astype(jnp.bfloat16), mask.astype(jnp.bfloat16)], axis=-1
    )
    if not views_outer:
        packed = jnp.transpose(packed, (2, 0, 1, 3))  # [V, R, S, F+1]
        rd_t = jnp.transpose(ray_diff.astype(jnp.bfloat16), (2, 0, 1, 3))
    else:
        rd_t = ray_diff.astype(jnp.bfloat16)
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
        pl.BlockSpec(
            (v, ray_block, s, 4), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (ray_block, s, 2 * POSENC), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]

    rgb, w = pl.pallas_call(
        functools.partial(_gnt_kernel, ray_block, s, v, feat_in),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            # 3D blocks whose last two dims equal the array dims (the Pallas
            # divisibility rule) — the kernel writes slot [0]
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
    )(packed, rd_t, pos_code, *weights)
    return {
        "rgb": rgb.reshape(r, 3),
        "weights": w.reshape(r, s),
    }
