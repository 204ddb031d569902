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
from pgdvs_tpu.renderers.static_gnt import render_rays_gnt


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

    Returns dict of [rh, rw, ...] maps (same contract as render_image_gnt).
    """
    feature_net, gnt = models
    h, w = image_hw
    n_dev = mesh.devices.size
    # NOTE: the fused Pallas kernel runs fine inside shard_map — each shard
    # invokes its own pallas_call on its ray slice with no cross-shard
    # semantics (rays are embarrassingly parallel); the ray-axis shard size
    # must stay divisible by pallas_ray_block, which the padding below
    # guarantees (tile multiple of n_dev * ray_block).

    feats = feature_net.apply(params["feature_net"], src_rgbs)

    # same sampling mode as the single-device render (fused/quad maps are
    # per-view and replicated across the mesh)
    fused_maps = None
    map_scales = None
    map_vhw = None  # static (V, H, W) of flattened quad maps
    if cfg.epipolar_mode in ("fused", "quad", "quad_i8"):
        from pgdvs_tpu.models.gnt.projector import (
            build_fused_maps,
            build_quad_maps,
            quantize_quad_maps,
        )

        build = (
            build_quad_maps
            if cfg.epipolar_mode.startswith("quad")
            else build_fused_maps
        )
        fused_maps = build(
            src_rgbs,
            feats,
            src_invalid_masks if cfg.gnt_use_dyn_mask else None,
            dtype=gnt.dtype if gnt.dtype != "float32" else None,
        )
        if cfg.epipolar_mode == "quad_i8":
            fused_maps, map_scales = quantize_quad_maps(fused_maps)
        if cfg.epipolar_mode.startswith("quad"):
            # flatten to the gather's 2D row table outside the shard body so
            # the relayout transpose runs once (see projector.FlatQuadMaps)
            mv, mh, mw, mc4 = fused_maps.shape
            map_vhw = (mv, mh, mw)
            fused_maps = fused_maps.reshape(mv * mh * mw, mc4)
    rays_o, rays_d, _uv, (rh, rw) = cameras.get_rays(
        h, w, cameras.flat_cam_intrinsics(tgt_cam), cameras.flat_cam_c2w(tgt_cam),
        stride=cfg.render_stride,
    )
    n_rays = rh * rw
    if depth_range.ndim == 1:
        dr = jnp.broadcast_to(depth_range, (n_rays, 2))
    else:
        dr = depth_range[:: cfg.render_stride, :: cfg.render_stride].reshape(-1, 2)

    # pad so each shard's ray count is a multiple of the Pallas ray block
    quantum = n_dev * max(cfg.pallas_ray_block, 1)
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
        "maps": fused_maps,
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
        if map_vhw is not None:
            from pgdvs_tpu.models.gnt.projector import FlatQuadMaps

            maps = FlatQuadMaps(maps, map_vhw, repl["map_scales"])
        out = render_rays_gnt(
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
            src_fused_maps=maps,
        )
        return out

    out = shard_fn(repl, rays_o_p, rays_d_p, dr_p)

    def unpad(x):
        return x[:n_rays].reshape((rh, rw) + x.shape[1:])

    return {k: unpad(v) for k, v in out.items()}


def make_sharded_eval_fn(mesh: Mesh, models, cfg: RenderConfig, static_mode="gnt"):
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
            models, params, data, cfg, key, static_mode=static_mode
        )

    batched = jax.vmap(render_one, in_axes=(None, 0, 0))
    data_sharding = NamedSharding(mesh, P(("dp", "rp")))
    return jax.jit(
        batched,
        in_shardings=(None, data_sharding, data_sharding),
        out_shardings=data_sharding,
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
