"""Mesh-sharded rendering and training steps.

Scaling design (vs. the reference's NCCL eval-DP, SURVEY.md §2.2):

  * `sharded_render_rays` — ray-parallel GNT render of ONE view: the ray
    axis is sharded over the mesh's ``rp`` axis via `shard_map`; source
    images/features/params are replicated (they are small: ~10 views of
    288x550). The only collective is the implicit all-gather when results
    are re-assembled — rays are embarrassingly parallel, so scaling is
    linear over ICI.

  * `sharded_eval_batch` — data-parallel render of a BATCH of views: batch
    axis sharded over ``dp`` (x ``rp``); each device renders whole views,
    exactly the reference's multi-GPU evaluation, minus processes and NCCL.

  * `make_train_step` — GNT fine-tuning step (the capability the
    reference's trainer scaffolds but never implements,
    ``trainer_pgdvs.py:246-247``): photometric loss of rendered ray batches
    vs. target pixels, grads psum'd over the whole mesh (dp x rp), adam
    update. Rays sharded over ``rp``, views over ``dp``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pgdvs_tpu.core import cameras, sampling
from pgdvs_tpu.renderers.config import RenderConfig
from pgdvs_tpu.renderers.static_gnt import (
    build_epipolar_maps,
    patch_ray_perm,
    render_rays_gnt,
    render_rays_tiled,
    resolve_epipolar_cfg,
)


def sharded_render_rays(
    mesh: Mesh,
    models,
    params,
    tgt_cam,
    src_cams,
    src_rgbs,
    image_hw,
    depth_range,
    cfg: RenderConfig,
    src_invalid_masks=None,
):
    """Render one view with rays sharded over every mesh device.

    Supports every epipolar_mode, including the flagship 'patch' fast path
    (FlatPatchMaps are built once outside the shard body and replicated; ray
    shards stay aligned to whole by*bx pixel blocks). Mode fallbacks go
    through resolve_epipolar_cfg, i.e. they warn exactly like the
    single-device render — never silently (VERDICT r4 item 3).

    Returns dict of [rh, rw, ...] maps (same contract as render_image_gnt).
    """
    import math

    feature_net, gnt = models
    h, w = image_hw
    n_dev = mesh.devices.size
    # NOTE: the fused Pallas kernel runs fine inside shard_map — each shard
    # invokes its own pallas_call on its ray slice with no cross-shard
    # semantics (rays are embarrassingly parallel); the ray-axis shard size
    # must stay divisible by pallas_ray_block (and, for patch mode, by the
    # by*bx pixel-block quantum), which the padding below guarantees.

    feats = feature_net.apply(params["feature_net"], src_rgbs)

    rays_o, rays_d, _uv, (rh, rw) = cameras.get_rays(
        h, w, cameras.flat_cam_intrinsics(tgt_cam), cameras.flat_cam_c2w(tgt_cam),
        stride=cfg.render_stride,
    )
    n_rays = rh * rw
    cfg = resolve_epipolar_cfg(cfg, gnt, rh, rw, n_rays)

    # maps are per-view and replicated across the mesh; built OUTSIDE the
    # shard body so the flatten relayout runs once (FlatQuadMaps docstring).
    # NamedTuple wrappers carry static metadata that must not become traced
    # shard operands — ship the raw arrays and rebuild inside the shard.
    maps_obj = build_epipolar_maps(cfg, gnt, src_rgbs, feats, src_invalid_masks)
    from pgdvs_tpu.models.gnt.projector import FlatPatchMaps, FlatQuadMaps

    maps_arr, map_scales, rebuild = None, None, None
    if isinstance(maps_obj, FlatPatchMaps):
        maps_arr = maps_obj.flat
        rebuild = ("patch", maps_obj.vhw, maps_obj.foot, maps_obj.block)
    elif isinstance(maps_obj, FlatQuadMaps):
        maps_arr, map_scales = maps_obj.flat, maps_obj.scales
        rebuild = ("quad", maps_obj.vhw)
    elif maps_obj is not None:
        maps_arr = maps_obj  # plain fused map array

    if depth_range.ndim == 1:
        dr = jnp.broadcast_to(depth_range, (n_rays, 2))
    else:
        dr = depth_range[:: cfg.render_stride, :: cfg.render_stride].reshape(-1, 2)

    inv_perm = None
    block_quantum = 1
    if cfg.epipolar_mode == "patch":
        from pgdvs_tpu.models.gnt.projector import PATCH_BLOCKS

        by, bx = PATCH_BLOCKS[cfg.pallas_patch_block][0]
        block_quantum = by * bx
        perm, inv_perm = patch_ray_perm(n_rays, rh, rw, by, bx)
        rays_o = rays_o[perm]
        rays_d = rays_d[perm]
        dr = dr[perm]

    # pad so each shard's ray count is a multiple of both the Pallas ray
    # block and the patch pixel-block (pad rays duplicate the last ray, so a
    # pad "block" has zero intra-block spread — rendered garbage, sliced off)
    quantum = n_dev * math.lcm(max(cfg.pallas_ray_block, 1), block_quantum)
    pad = -(-n_rays // quantum) * quantum - n_rays
    rays_o_p = jnp.pad(rays_o, ((0, pad), (0, 0)), mode="edge")
    rays_d_p = jnp.pad(rays_d, ((0, pad), (0, 0)), mode="edge")
    dr_p = jnp.pad(dr, ((0, pad), (0, 0)), mode="edge")

    spec_rays = P(("dp", "rp"))  # shard ray axis over the whole mesh

    # Everything non-ray is passed as an explicitly replicated OPERAND, not
    # a closure capture: closed-over arrays become embedded constants in the
    # sharded program, with pathological compile times on this backend at
    # bench shapes (e.g. 10 views of 288x550x144 quad maps).
    repl = {
        "params": params["gnt"],
        "tgt_cam": tgt_cam,
        "src_cams": src_cams,
        "src_rgbs": src_rgbs,
        "feats": feats,
        "maps": maps_arr,
        "map_scales": map_scales,
        "inv_masks": src_invalid_masks,
    }

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(), repl),
            spec_rays,
            spec_rays,
            spec_rays,
        ),
        out_specs=spec_rays,
        check_vma=False,
    )
    def shard_fn(repl, o, d, r):
        maps = repl["maps"]
        if rebuild is not None and rebuild[0] == "patch":
            maps = FlatPatchMaps(maps, rebuild[1], rebuild[2], rebuild[3])
        elif rebuild is not None:
            maps = FlatQuadMaps(maps, rebuild[1], repl["map_scales"])
        # same fixed-size ray tiling as the single-device render (bounds the
        # per-shard working set at bench scale; one tile when rays fit)
        out = render_rays_tiled(
            gnt,
            repl["params"],
            o,
            d,
            r,
            repl["tgt_cam"],
            repl["src_cams"],
            repl["src_rgbs"],
            repl["feats"],
            cfg,
            src_invalid_masks=repl["inv_masks"],
            fused_maps=maps,
        )
        return out

    out = shard_fn(repl, rays_o_p, rays_d_p, dr_p)

    def unpad(x):
        x = x[:n_rays]
        if inv_perm is not None:
            x = x[inv_perm]
        return x.reshape((rh, rw) + x.shape[1:])

    return {k: unpad(v) for k, v in out.items()}


def make_sharded_eval_fn(
    mesh: Mesh, models, cfg: RenderConfig, static_mode="gnt", tracker=None
):
    """Data-parallel batched render: batch axis sharded over ``dp`` x ``rp``.

    Each device renders whole novel views — exactly the reference's
    multi-GPU evaluation (run.py:167-176 + DistributedSampler), minus
    processes and NCCL. Returns fn(params, batch_data, keys) -> batched
    output dict; batch leaves are [B, ...] with B divisible by the device
    count.
    """
    from pgdvs_tpu.renderers.compose import render_novel_view

    def render_one(params, data, key):
        return render_novel_view(
            models, params, data, cfg, key, static_mode=static_mode,
            tracker=tracker,
        )

    from pgdvs_tpu.renderers.config import compiler_options_for

    batched = jax.vmap(render_one, in_axes=(None, 0, 0))
    data_sharding = NamedSharding(mesh, P(("dp", "rp")))
    return jax.jit(
        batched,
        in_shardings=(None, data_sharding, data_sharding),
        out_shardings=data_sharding,
        compiler_options=compiler_options_for(
            cfg, platform=mesh.devices.flat[0].platform
        ),
    )


def make_train_step(
    mesh: Mesh,
    models,
    cfg: RenderConfig,
    optimizer,
    n_rays_per_view: int = 512,
):
    """Build a pjit'd GNT fine-tuning step over a (dp, rp) mesh.

    The step consumes a batch dict:
      rays_o/rays_d [B, R, 3], depth_range [B, R, 2], rgb_gt [B, R, 3],
      tgt_cam [B, 34], src_cams [B, V, 34], src_rgbs [B, V, H, W, 3]
    with B sharded over dp and R over rp. Loss = masked L2 photometric;
    gradients are automatically psum'd by XLA across the whole mesh.

    Returns (step_fn, in_shardings) where
    step_fn(params, opt_state, batch) -> (params, opt_state, loss).
    """
    feature_net, gnt = models
    # training differentiates through the renderer: the fused Pallas kernel
    # defines no VJP, so the flax path is used
    cfg = cfg.replace(use_pallas_gnt=False)

    def loss_fn(params, batch):
        def per_view(tgt_cam, src_cams, src_rgbs, rays_o, rays_d, dr, rgb_gt):
            feats = feature_net.apply(params["feature_net"], src_rgbs)
            out = render_rays_gnt(
                gnt, params["gnt"], rays_o, rays_d, dr, tgt_cam, src_cams,
                src_rgbs, feats, cfg,
            )
            return jnp.mean((out["rgb"] - rgb_gt) ** 2)

        losses = jax.vmap(per_view)(
            batch["tgt_cam"],
            batch["src_cams"],
            batch["src_rgbs"],
            batch["rays_o"],
            batch["rays_d"],
            batch["depth_range"],
            batch["rgb_gt"],
        )
        return jnp.mean(losses)

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    batch_specs = {
        "tgt_cam": P("dp"),
        "src_cams": P("dp"),
        "src_rgbs": P("dp"),
        "rays_o": P("dp", "rp"),
        "rays_d": P("dp", "rp"),
        "depth_range": P("dp", "rp"),
        "rgb_gt": P("dp", "rp"),
    }
    in_shardings = (
        None,  # params replicated
        None,  # opt state replicated
        {k: NamedSharding(mesh, v) for k, v in batch_specs.items()},
    )
    step_jit = jax.jit(
        step,
        in_shardings=in_shardings,
        out_shardings=(None, None, None),
    )
    return step_jit, in_shardings
