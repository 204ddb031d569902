"""Training engine — per-scene GNT fine-tuning over a device mesh.

The reference trainer is scaffolding only (``run_train`` raises
NotImplementedError, ``trainer_pgdvs.py:246-247``; optimizer = None at
``:168``). This engine implements the capability: photometric fine-tuning
of the GNT weights on a scene's source views, with

  * random ray batches against held-in target frames,
  * the (dp=views, rp=rays) mesh-sharded train step from
    ``pgdvs_tpu.parallel.sharded`` (grads psum'd by XLA),
  * orbax checkpointing with frozen-module exclusion and retention,
  * periodic eval via the Evaluator.
"""

from __future__ import annotations

import logging
import time
from typing import Iterable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from pgdvs_tpu.core import cameras
from pgdvs_tpu.engines.checkpoint import restore_checkpoint, save_checkpoint
from pgdvs_tpu.parallel.mesh import make_mesh
from pgdvs_tpu.parallel.sharded import make_train_step
from pgdvs_tpu.renderers.config import RenderConfig

LOGGER = logging.getLogger(__name__)


def sample_ray_batch(rng: np.random.Generator, data: dict, n_rays: int):
    """Ray batch supervised by the item's explicit target view.

    NOTE: on evaluation datasets ``rgb_tgt`` IS the held-out ground-truth
    view — training against it leaks the test signal into the weights and
    invalidates any subsequent metric on the same scene. Use it only for
    debugging/overfit checks; `sample_ray_batch_src` is the honest
    fine-tuning objective.
    """
    tgt_cam = np.asarray(data["flat_cam_tgt"])
    h, w = data["rgb_tgt"].shape[:2]
    idx = rng.integers(0, h * w, size=n_rays)
    dr = _ray_depth_range(data, idx, n_rays)
    rays_o, rays_d = _view_rays(tgt_cam, h, w, idx)
    return {
        "tgt_cam": tgt_cam,
        "src_cams": np.asarray(data["flat_cam_src_spatial"]),
        "src_rgbs": np.asarray(data["rgb_src_spatial"]),
        "rays_o": rays_o,
        "rays_d": rays_d,
        "depth_range": dr,
        "rgb_gt": np.asarray(data["rgb_tgt"]).reshape(-1, 3)[idx],
    }


def sample_ray_batch_src(rng: np.random.Generator, data: dict, n_rays: int):
    """Self-supervised ray batch: one SOURCE view is held out as the target
    and rendered from the remaining sources.

    This never touches ``rgb_tgt`` (the held-out evaluation pixels), so
    fine-tuning with it keeps eval metrics honest. When a dynamic mask for
    the chosen source view is available, rays are drawn from static pixels
    only — the GNT branch being tuned is the static renderer, and dynamic
    content is inconsistent across the source frames.
    """
    src_cams = np.asarray(data["flat_cam_src_spatial"])
    src_rgbs = np.asarray(data["rgb_src_spatial"])
    n_views = src_cams.shape[0]
    if n_views < 2:
        raise ValueError(
            "self-supervised fine-tuning needs >= 2 spatial source views"
        )
    j = int(rng.integers(0, n_views))
    keep = [i for i in range(n_views) if i != j]
    h, w = src_rgbs.shape[1:3]

    p = None
    masks = data.get("dyn_mask_src_spatial")
    if masks is not None:
        static = (np.asarray(masks[j]).reshape(-1) == 0).astype(np.float64)
        if static.sum() >= n_rays:  # else: fall back to uniform
            p = static / static.sum()
    idx = rng.choice(h * w, size=n_rays, replace=True, p=p)
    dr = _ray_depth_range(data, idx, n_rays, pixel_aligned=False)
    rays_o, rays_d = _view_rays(src_cams[j], h, w, idx)
    return {
        "tgt_cam": src_cams[j],
        "src_cams": src_cams[keep],
        "src_rgbs": src_rgbs[keep],
        "rays_o": rays_o,
        "rays_d": rays_d,
        "depth_range": dr,
        "rgb_gt": src_rgbs[j].reshape(-1, 3)[idx],
    }


def _view_rays(flat_cam, h, w, idx):
    k4 = np.asarray(flat_cam)[2:18].reshape(4, 4)
    c2w = np.asarray(flat_cam)[18:34].reshape(4, 4)
    rays_o, rays_d, _uv, _ = cameras.get_rays(h, w, k4, c2w)
    return np.asarray(rays_o)[idx], np.asarray(rays_d)[idx]


def _ray_depth_range(data, idx, n_rays, pixel_aligned=True):
    """Per-ray [near, far]. Scene-level ranges tile; per-pixel [H, W, 2]
    maps index by ray — but only when the rays live in the view the map
    was built for (`pixel_aligned`); source-view batches collapse them to
    the scene-wide [min, max]."""
    dr = np.asarray(data["depth_range"], np.float32)
    if dr.ndim == 1:
        return np.tile(dr, (n_rays, 1))
    flat = dr.reshape(-1, 2)
    if pixel_aligned:
        return flat[idx]
    return np.tile(
        np.array([flat[:, 0].min(), flat[:, 1].max()], np.float32),
        (n_rays, 1),
    )


class Trainer:
    def __init__(
        self,
        models,
        params,
        cfg: RenderConfig,
        lr: float = 5e-4,
        n_rays_per_view: int = 512,
        mesh=None,
        ckpt_dir: Optional[str] = None,
        modules_not_to_save: Sequence[str] = (),
        n_ckpts_keep: int = -1,
        train_on: str = "src",
    ):
        import optax

        self.models = models
        self.cfg = cfg
        self.n_rays = n_rays_per_view
        self.mesh = mesh if mesh is not None else make_mesh(rp=1)
        self.optimizer = optax.adam(lr)
        self.params = self._replicate(params)
        self.opt_state = self.optimizer.init(self.params)
        self.ckpt_dir = ckpt_dir
        if train_on not in ("src", "tgt"):
            raise ValueError(f"train_on must be 'src' or 'tgt', got {train_on!r}")
        # 'src': self-supervised held-out-source objective (honest).
        # 'tgt': supervise on the item's explicit target view — on eval
        # datasets that is the held-out ground truth (leaks the test
        # signal); debugging/overfit checks only.
        self.train_on = train_on
        self.modules_not_to_save = tuple(modules_not_to_save)
        self.n_ckpts_keep = n_ckpts_keep
        self.step = 0
        self.epoch = 0
        self._step_fn, _ = make_train_step(
            self.mesh, models, cfg, self.optimizer, n_rays_per_view
        )

    def _replicate(self, tree):
        """Place a pytree fully-replicated over the training mesh.

        Checkpoint restores (and eager inits) produce arrays committed to a
        single device; the mesh-sharded step would reject mixing them with
        dp/rp-sharded batches ("incompatible devices")."""
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(self.mesh, PartitionSpec())
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree
        )

    def resume(self):
        if self.ckpt_dir is None:
            raise ValueError(
                "resume() needs a checkpoint directory (Trainer(ckpt_dir=...) "
                "/ run.py train --out-dir)"
            )
        # the on-disk payload excludes modules_not_to_save (save_checkpoint
        # filters params), so the restore template must match; restored
        # modules are merged over the live (frozen-included) params
        saved_params = {
            k: v
            for k, v in self.params.items()
            if k not in self.modules_not_to_save
        }
        payload, at = restore_checkpoint(
            self.ckpt_dir, {"params": saved_params, "opt_state": self.opt_state}
        )
        if payload is not None:
            self.params = self._replicate({**self.params, **payload["params"]})
            self.opt_state = self._replicate(payload["opt_state"])
            self.epoch, self.step = at
            LOGGER.info("resumed from epoch %d step %d", self.epoch, self.step)
        return self

    def train_epoch(self, dataset: Iterable, seed: int = 0, log_every: int = 10):
        """One pass over the dataset; batches = dp views x rp-sharded rays."""
        rng = np.random.default_rng(seed + self.epoch)
        dp = self.mesh.shape["dp"]
        buf = []
        losses = []
        t0 = time.time()

        def flush():
            batch = {
                k: jnp.asarray(np.stack([b[k] for b in buf])) for k in buf[0]
            }
            buf.clear()
            with self.mesh:
                self.params, self.opt_state, loss = self._step_fn(
                    self.params, self.opt_state, batch
                )
            self.step += 1
            losses.append(float(loss))
            if self.step % log_every == 0:
                LOGGER.info(
                    "step %d loss %.5f (%.2f s/step)",
                    self.step,
                    float(loss),
                    (time.time() - t0) / max(len(losses), 1),
                )

        sampler = (
            sample_ray_batch_src if self.train_on == "src" else sample_ray_batch
        )
        for data in dataset:
            if "rgb_src_spatial" not in data or (
                self.train_on == "tgt" and "rgb_tgt" not in data
            ):
                continue
            buf.append(sampler(rng, data, self.n_rays))
            if len(buf) == dp:
                flush()
        if buf:
            # epoch remainder (scene has fewer views than dp, or a partial
            # final batch): cycle the buffered views up to dp so small
            # scenes still train on wide meshes (the repeats just weight
            # those views' rays 2x in this one step)
            n = len(buf)
            buf.extend(buf[i % n] for i in range(dp - n))
            flush()
        self.epoch += 1
        if self.ckpt_dir is not None:
            save_checkpoint(
                self.ckpt_dir,
                self.params,
                self.opt_state,
                epoch=self.epoch,
                step=self.step,
                modules_not_to_save=self.modules_not_to_save,
                keep=self.n_ckpts_keep,
            )
        return float(np.mean(losses)) if losses else float("nan")
