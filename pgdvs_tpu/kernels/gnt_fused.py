"""Fused GNT transformer — scanned Pallas view/ray kernels.

The XLA version of the depth-8 GNT materializes every [rays, samples, views,
64] intermediate in HBM (~9 GB per block per 2048-ray tile even in bf16),
making the transformer HBM-bound. Here each transformer *block* runs as two
Pallas kernels that keep all intermediates in VMEM:

  * `_view_kernel`: subtraction attention over source views — every dense
    layer is ONE [views*rays*samples, 64] matmul (a per-view matmul loop
    leaves the MXU ~10x underfed), masked view softmax via static
    views-outer slice arithmetic;
  * `_ray_kernel`: 4-head QK attention over samples + feed-forward.

A jax-level `lax.scan` over the pair-stacked weights (the flax nn.scan
layout) applies the pair body [view -> q_fc (XLA) -> ray -> view -> ray]
4 times. Each kernel is compiled ONCE: this backend's Mosaic compile time
is superlinear in program size (a monolithic 8-block kernel took tens of
minutes to compile; individual ops compile in ~1 s), so the block stack
must be factored into small kernels — the cost is the [rays, samples, 64]
query tokens (and the per-view token tensor) round-tripping HBM between
kernels, ~0.6 s/image of traffic at benchmark scale.

Matches `pgdvs_tpu.models.gnt.network.GNT` (depth 8, width 64, bf16) —
`flatten_gnt_params` adapts the flax param tree, and the unit tests check
numerical agreement against `GNT.apply` and the reference torch network.

Mosaic layout notes: token tensors are 2D [views*rays*samples, C] with
views OUTER (per-view slices are static sublane slices; query broadcast =
sublane concat); ray attention uses lane slices per head +
single-batch-dim dot_general; the per-sample weights output keeps its
singleton axis ([R, 1, S]) to avoid an unsupported squeeze-reshape.
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
N_PAIRS = DEPTH // 2
HEADS = 4
POSENC = 63  # 3 + 3*2*10
NEG = -1e30

# weight counts per sub-module (see flatten ordering below)
N_VIEW_W = 21
N_QFC_W = 4
N_RAY_W = 13


def _block_paths(slot: str):
    """Ordered weight paths for one transformer block, matching the kernels'
    consumption order. Slot 'a' additionally owns the q_fc MLP (applied
    between its view and ray transformers on even blocks)."""
    vt = f"view_trans_{slot}"
    rt = f"ray_trans_{slot}"
    paths = [
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
    ]
    if slot == "a":
        paths += [
            ("q_fc_0", "kernel"), ("q_fc_0", "bias"),
            ("q_fc_1", "kernel"), ("q_fc_1", "bias"),
        ]
    paths += [
        (rt, "attn_norm", "scale"), (rt, "attn_norm", "bias"),
        (rt, "attn", "q_fc", "kernel"),
        (rt, "attn", "k_fc", "kernel"),
        (rt, "attn", "v_fc", "kernel"),
        (rt, "attn", "out_fc", "kernel"), (rt, "attn", "out_fc", "bias"),
        (rt, "ff_norm", "scale"), (rt, "ff_norm", "bias"),
        (rt, "ff", "fc1", "kernel"), (rt, "ff", "fc1", "bias"),
        (rt, "ff", "fc2", "kernel"), (rt, "ff", "fc2", "bias"),
    ]
    return paths


PAIR_PATHS = _block_paths("a") + _block_paths("b")
N_A = len(_block_paths("a"))
assert N_A == N_VIEW_W + N_QFC_W + N_RAY_W


def flatten_gnt_params(gnt_params):
    """Flax GNT params -> (head_weights list, pair-stacked weights list).

    Head/tail weights are single arrays; pair weights are one [n_pairs, ...]
    array per `PAIR_PATHS` entry, taken directly from the flax nn.scan
    layout. All bf16 (the kernels compute in bf16; layernorm stats in f32).
    """
    p = gnt_params["params"]
    head = [
        p["rgbfeat_fc_0"]["kernel"], p["rgbfeat_fc_0"]["bias"],
        p["rgbfeat_fc_1"]["kernel"], p["rgbfeat_fc_1"]["bias"],
        p["norm"]["scale"], p["norm"]["bias"],
        p["rgb_fc"]["kernel"], p["rgb_fc"]["bias"],
    ]
    bp = p["block_pairs"]
    pair = []
    for path in PAIR_PATHS:
        cur = bp
        for k in path:
            cur = cur[k]
        pair.append(cur)
    to16 = lambda ws: [jnp.asarray(w).astype(jnp.bfloat16) for w in ws]
    return to16(head), to16(pair)


def _layernorm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )


def _dense(x, w, b=None):
    out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _view_kernel(
    rb: int,
    s: int,
    v: int,
    q_ref,     # [rb, s, NW] bf16
    h_ref,     # [v, rb, s, NW] bf16
    rd_ref,    # [v, rb, s, 4] bf16
    bias_ref,  # [v, rb, s, 1] bf16 (0 or -1e30; bf16 spans the f32 range)
    *rest,
):
    weight_refs = rest[:N_VIEW_W]
    q_out_ref = rest[-1]
    dtype = jnp.bfloat16
    ns = rb * s
    nv = v * ns

    h = h_ref[:].reshape(nv, NW)
    ray_diff = rd_ref[:].reshape(nv, 4)
    view_bias = bias_ref[:].reshape(nv, 1)
    q = q_ref[:].reshape(ns, NW)

    wi = iter([r[:] for r in weight_refs])

    def w():
        return next(wi)

    def vslice(x, i):
        return x[i * ns : (i + 1) * ns]

    x = _layernorm(q, w(), w(), 1e-6)  # [ns, NW]
    qp = _dense(x, w())
    w_k, w_v = w(), w()
    w_p0, b_p0, w_p1, b_p1 = w(), w(), w(), w()
    w_a0, b_a0, w_a1, b_a1 = w(), w(), w(), w()
    # per-view online softmax (flash-style single pass): empirically ~2x
    # faster on this backend than one [nv, NW] views-batched pipeline — the
    # tall-tensor relayouts/broadcasts cost more than the smaller matmuls,
    # and no [nv, NW] tensor is ever live (VMEM stays small)
    mx = jnp.full((ns, NW), NEG, jnp.float32)
    den = jnp.zeros((ns, NW), jnp.float32)
    num = jnp.zeros((ns, NW), jnp.float32)
    for i in range(v):
        kp_i = _dense(vslice(h, i), w_k)
        vp_i = _dense(kp_i, w_v)
        pos_i = _dense(jax.nn.relu(_dense(vslice(ray_diff, i), w_p0, b_p0)),
                       w_p1, b_p1)
        lg_i = kp_i - qp + pos_i
        lg_i = _dense(jax.nn.relu(_dense(lg_i, w_a0, b_a0)), w_a1, b_a1)
        lg_i = lg_i.astype(jnp.float32) + vslice(view_bias, i).astype(
            jnp.float32
        )
        m_new = jnp.maximum(mx, lg_i)
        scale = jnp.exp(mx - m_new)
        ex = jnp.exp(lg_i - m_new)
        den = den * scale + ex
        num = num * scale + ex * (vp_i + pos_i).astype(jnp.float32)
        mx = m_new
    agg = (num / den).astype(dtype)  # [ns, NW]

    agg = _dense(agg, w(), w())
    x = agg + q
    y = _layernorm(x, w(), w(), 1e-6)
    y = _dense(jax.nn.relu(_dense(y, w(), w())), w(), w())
    q_out_ref[:] = (y + x).reshape(rb, s, NW)


def _ray_kernel(
    rb: int,
    s: int,
    blockdiag: bool,
    q_ref,  # [rb, s, NW] bf16
    *rest,
):
    weight_refs = rest[:N_RAY_W]
    q_out_ref, w_out_ref = rest[-2:]
    dtype = jnp.bfloat16
    ns = rb * s
    q = q_ref[:].reshape(ns, NW)

    wi = iter([r[:] for r in weight_refs])

    def w():
        return next(wi)

    xr = _layernorm(q, w(), w(), 1e-6)
    hd = NW // HEADS
    qf = _dense(xr, w())
    kf = _dense(xr, w())
    vf = _dense(xr, w())

    if blockdiag:
        # full-MXU-width formulation: per-head logits computed as ONE
        # [s, NW] x [NW, HEADS*s] matmul per ray by masking K/V to each
        # head's channel block and concatenating along the key axis —
        # L[:, h*s + j] = q_h . k_h[j] since other heads' channels are
        # zeroed. 4x redundant MACs but 64-deep contraction and 4x wider
        # outputs instead of HEADS tiny [s,16] matmuls.
        q3 = qf.reshape(rb, s, NW)
        k3 = kf.reshape(rb, s, NW)
        v3 = vf.reshape(rb, s, NW)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, NW), 2)
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, NW, 1), 1)
        kt = jnp.swapaxes(k3, 1, 2)  # [rb, NW, s]
        k_big = jnp.concatenate(
            [
                kt
                * ((sub >= hh * hd) & (sub < (hh + 1) * hd)).astype(dtype)
                for hh in range(HEADS)
            ],
            axis=2,
        )  # [rb, NW, HEADS*s]
        v_big = jnp.concatenate(
            [
                v3 * ((lane >= hh * hd) & (lane < (hh + 1) * hd)).astype(dtype)
                for hh in range(HEADS)
            ],
            axis=1,
        )  # [rb, HEADS*s, NW]
        lg = jax.lax.dot_general(
            q3, k_big,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) / np.sqrt(hd)  # [rb, s, HEADS*s]
        # per-head softmax over each s-wide lane block
        def hslice(x, hh):
            return x[:, :, hh * s : (hh + 1) * s]

        mx = [jnp.max(hslice(lg, hh), axis=-1, keepdims=True)
              for hh in range(HEADS)]
        ex = jnp.exp(
            (lg - jnp.concatenate(
                [jnp.broadcast_to(m, (rb, s, s)) for m in mx], axis=2
            )).astype(dtype)
        )
        den = jnp.concatenate(
            [
                jnp.broadcast_to(
                    jnp.sum(hslice(ex, hh), axis=-1, keepdims=True), (rb, s, s)
                )
                for hh in range(HEADS)
            ],
            axis=2,
        )
        attn = ex / den  # [rb, s, HEADS*s], rows of each block sum to 1
        out = jax.lax.dot_general(
            attn, v_big,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dtype).reshape(ns, NW)  # head outputs land in head channels
        w_acc = hslice(attn, 0)[:, 0:1, :].astype(jnp.float32)
        for hh in range(1, HEADS):
            w_acc = w_acc + hslice(attn, hh)[:, 0:1, :].astype(jnp.float32)
    else:
        def heads_to_batch(t):
            # [ns, NW] -> [HEADS*rb, s, hd]: head lanes -> batch dim, so ALL
            # heads run in ONE batched dot_general (4x fewer MXU launches)
            parts = [
                t[:, hh * hd : (hh + 1) * hd].reshape(rb, s, hd)
                for hh in range(HEADS)
            ]
            return jnp.concatenate(parts, axis=0)

        q3 = heads_to_batch(qf)
        k3 = heads_to_batch(kf)
        v3 = heads_to_batch(vf)
        lgh = jax.lax.dot_general(
            q3, k3,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) / np.sqrt(hd)  # [HEADS*rb, s, s]
        lgh = lgh - jnp.max(lgh, axis=-1, keepdims=True)
        exh = jnp.exp(lgh.astype(dtype))
        attn = exh / jnp.sum(exh, axis=-1, keepdims=True)
        outh = jax.lax.dot_general(
            attn, v3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dtype)  # [HEADS*rb, s, hd]
        out = jnp.concatenate(
            [
                outh[hh * rb : (hh + 1) * rb].reshape(ns, hd)
                for hh in range(HEADS)
            ],
            axis=-1,
        )  # [ns, NW]
        w_acc = attn[0 * rb : 1 * rb, 0:1, :].astype(jnp.float32)
        for hh in range(1, HEADS):
            w_acc = w_acc + attn[hh * rb : (hh + 1) * rb, 0:1, :].astype(
                jnp.float32
            )
    out = _dense(out, w(), w())
    xq = q + out
    y = _layernorm(xq, w(), w(), 1e-6)
    y = _dense(jax.nn.relu(_dense(y, w(), w())), w(), w())
    q_out_ref[:] = (xq + y).reshape(rb, s, NW)
    w_out_ref[0] = (w_acc / HEADS).astype(jnp.float32)


def _vmem(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


def _run_view(q, h, rd, bias, weights, rb, interpret):
    v, r, s, _ = h.shape
    grid = (r // rb,)
    in_specs = [
        pl.BlockSpec((rb, s, NW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (v, rb, s, NW), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (v, rb, s, 4), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (v, rb, s, 1), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
    ] + _vmem(len(weights))
    return pl.pallas_call(
        functools.partial(_view_kernel, rb, s, v),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (rb, s, NW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r, s, NW), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
        interpret=interpret,
    )(q, h, rd, bias, *weights)


def _run_ray(q, weights, rb, interpret, blockdiag=False):
    r, s, _ = q.shape
    grid = (r // rb,)
    in_specs = [
        pl.BlockSpec((rb, s, NW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ] + _vmem(len(weights))
    return pl.pallas_call(
        functools.partial(_ray_kernel, rb, s, blockdiag),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (rb, s, NW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, rb, 1, s), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, s, NW), jnp.bfloat16),
            jax.ShapeDtypeStruct((grid[0], rb, 1, s), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
        interpret=interpret,
    )(q, *weights)


@functools.partial(
    jax.jit,
    static_argnames=("ray_block", "ray_block_ray", "interpret", "views_outer"),
)
def gnt_fused_apply(
    gnt_params,
    rgb_feat,
    ray_diff,
    mask,
    pts_code,
    view_code,
    ray_block: int = 8,
    ray_block_ray: int = 32,
    interpret: bool = False,
    views_outer: bool = False,
):
    """Run the fused GNT transformer.

    Args:
      gnt_params: the flax GNT param tree ({'params': ...}).
      rgb_feat: [R, S, V, 3+F]; ray_diff: [R, S, V, 4]; mask: [R, S, V, 1] —
        or, with views_outer=True, [V, R, S, *] (the kernels' native layout;
        skips two full-tensor transposes when the sampler already produces
        views-outer).
      pts_code: [R, S, 63]; view_code: [R, 63] (sinusoidal encodings).

    Returns dict {rgb [R, 3], weights [R, S]} (f32).
    """
    if views_outer:
        v, r, s, feat_in = rgb_feat.shape
    else:
        r, s, v, feat_in = rgb_feat.shape
    if r % ray_block != 0:
        raise ValueError(f"rays {r} not divisible by ray_block {ray_block}")
    # the ray kernel's VMEM footprint is tiny, so it runs a larger block
    while r % ray_block_ray != 0:
        ray_block_ray //= 2
    head, pair_stacked = flatten_gnt_params(gnt_params)

    if not views_outer:
        rgb_feat = jnp.transpose(rgb_feat, (2, 0, 1, 3))  # [V, R, S, F]
        ray_diff = jnp.transpose(ray_diff, (2, 0, 1, 3))
        mask = jnp.transpose(mask, (2, 0, 1, 3))
    rgb_feat = rgb_feat.astype(jnp.bfloat16)
    rd_t = ray_diff.astype(jnp.bfloat16)
    pos_code = jnp.concatenate(
        [pts_code, jnp.broadcast_to(view_code[:, None, :], pts_code.shape)],
        axis=-1,
    ).astype(jnp.bfloat16)

    # ---- XLA prologue: rgbfeat_fc + maxpool init + masked-softmax bias ----
    h = _dense(rgb_feat, head[0], head[1])
    h = _dense(jax.nn.relu(h), head[2], head[3])  # [V, R, S, NW] bf16
    q0 = jnp.max(h, axis=0)  # [R, S, NW]
    maskf = mask.astype(jnp.float32)
    all_invalid = jnp.sum(maskf, axis=0, keepdims=True) == 0.0
    view_bias = jnp.where(
        (maskf == 0.0) & (~all_invalid), NEG, 0.0
    ).astype(jnp.bfloat16)  # [V, R, S, 1]

    # ---- scanned pair body: view -> q_fc (XLA) -> ray -> view -> ray -----
    # (each Pallas kernel compiles ONCE; weights arrive as scan slices)
    def step(q, pw):
        a, b = pw[:N_A], pw[N_A:]
        q = _run_view(q, h, rd_t, view_bias, a[:N_VIEW_W], ray_block, interpret)
        # positional q_fc on the even block (XLA: one small matmul pair)
        qcat = jnp.concatenate([q, pos_code], axis=-1)
        w0, b0, w1, b1 = a[N_VIEW_W : N_VIEW_W + N_QFC_W]
        q = _dense(jax.nn.relu(_dense(qcat, w0, b0)), w1, b1)
        q, _w = _run_ray(
            q, a[N_VIEW_W + N_QFC_W :], ray_block_ray, interpret
        )
        q = _run_view(q, h, rd_t, view_bias, b[:N_VIEW_W], ray_block, interpret)
        q, w_out = _run_ray(q, b[N_VIEW_W:], ray_block_ray, interpret)
        return q, w_out

    q, w_hist = jax.lax.scan(step, q0, tuple(pair_stacked))
    w = w_hist[-1]  # last pair's ray-attention first-query row

    # ---- XLA epilogue: final norm + mean over samples + rgb head ---------
    hq = _layernorm(q.reshape(r * s, NW), head[4], head[5], 1e-6)
    pooled = jnp.mean(hq.reshape(r, s, NW).astype(jnp.float32), axis=1)
    rgb = _dense(pooled.astype(jnp.bfloat16), head[6], head[7])

    return {
        "rgb": rgb.astype(jnp.float32),
        "weights": w.reshape(r, s),
    }
