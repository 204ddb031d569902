"""Evaluation engine — renders novel views and scores them.

TPU counterpart of the reference evaluator
(``/root/reference/pgdvs/engines/evaluator_pgdvs.py``): per view render ->
NaN guard -> uint8 quantization -> masked PSNR/SSIM(/LPIPS) over full /
dynamic / static regions (DynIBaR protocol) -> per-image records + dataset
means. Views are distributed across devices/processes by simple index
striding (the reference's DistributedSampler semantics) with a final
cross-process sum via `jax.experimental.multihost_utils` when running under
`jax.distributed` (single-process: plain numpy reduce).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import pathlib
import pickle
import time
from typing import Callable, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from pgdvs_tpu.metrics.psnr_ssim import masked_psnr, masked_ssim, quantize_uint8
from pgdvs_tpu.renderers.compose import render_novel_view
from pgdvs_tpu.renderers.config import RenderConfig

LOGGER = logging.getLogger(__name__)


@dataclasses.dataclass
class EvalRecord:
    item_id: str
    metrics: dict
    wall_s: float


def _to_numpy_img(x):
    return np.clip(np.asarray(x, np.float64), 0.0, 1.0)


def resize_gt_to_render(rgb_gt, eval_mask, render_hw):
    """Resize GT + eval mask to the render resolution (render_stride > 1).

    Protocol (evaluator_pgdvs.py:81-92): AFTER uint8 quantization, GT is
    bicubic-antialias align_corners resized; the eval mask is nearest-resized
    and re-binarized. Uses torch's interpolate on host when available (the
    reference's exact kernel); falls back to jax.image.resize (cubic, no
    antialias — documented approximation).
    """
    rh, rw = render_hw
    if rgb_gt.shape[0] == rh and rgb_gt.shape[1] == rw:
        return rgb_gt, eval_mask
    try:
        import torch

        t = torch.tensor(rgb_gt, dtype=torch.float32).permute(2, 0, 1)[None]
        rgb_out = (
            torch.nn.functional.interpolate(
                t, size=(rh, rw), mode="bicubic", antialias=True,
                align_corners=True,
            )[0]
            .permute(1, 2, 0)
            .numpy()
            .astype(np.float64)
        )
    except ImportError:
        rgb_out = np.asarray(
            jax.image.resize(jnp.asarray(rgb_gt), (rh, rw, rgb_gt.shape[-1]),
                             "cubic"),
            np.float64,
        )
    if eval_mask is not None:
        from pgdvs_tpu.metrics.lpips_jax import _nearest_resize_torch

        m = jnp.asarray(eval_mask, jnp.float32)
        if m.ndim == 2:
            m = m[..., None]
        # torch F.interpolate 'nearest' floor semantics, matching the
        # reference's GT/mask resize (jax.image.resize rounds instead).
        m_out = np.asarray(_nearest_resize_torch(m[None], rh, rw)[0])
        eval_mask = (m_out > 0).astype(np.float64)
    return rgb_out, eval_mask


def compute_dycheck_metrics(pred, gt, covisible, lpips_params=None):
    """DyCheck iPhone protocol: mPSNR/mSSIM(/mLPIPS) over covisible masks
    (evaluator_pgdvs.py:282-415; metrics in pgdvs_tpu.metrics.dycheck)."""
    import jax.numpy as jnp

    from pgdvs_tpu.metrics import dycheck as dm
    from pgdvs_tpu.metrics.psnr_ssim import quantize_uint8

    pred_q = jnp.asarray(quantize_uint8(_to_numpy_img(pred)), jnp.float32)
    gt_q = jnp.asarray(quantize_uint8(_to_numpy_img(gt)), jnp.float32)
    m = jnp.asarray(covisible, jnp.float32)
    if m.ndim == 2:
        m = m[..., None]
    out = {
        "mpsnr": float(dm.compute_psnr(pred_q, gt_q, m)),
        "mssim": float(dm.compute_ssim(pred_q, gt_q, m)),
    }
    if lpips_params is not None:
        out["mlpips"] = float(dm.compute_lpips(lpips_params, pred_q, gt_q, m))
    return out


def compute_nvidia_metrics(pred, gt, dyn_mask, lpips_fn=None,
                           quantize_gt: bool = True):
    """Full / dynamic / static metric triplets, uint8-quantized inputs
    (evaluator_pgdvs.py:73-77,190-280). quantize_gt=False when the caller
    already quantized-then-resized GT (the reference does NOT re-quantize
    after the render_stride resize)."""
    pred_q = quantize_uint8(_to_numpy_img(pred))
    gt_q = quantize_uint8(_to_numpy_img(gt)) if quantize_gt else np.asarray(
        gt, np.float64
    )
    dyn = np.asarray(dyn_mask, np.float64)
    if dyn.ndim == 2:
        dyn = dyn[..., None]
    dyn3 = np.repeat(dyn, 3, axis=-1) if dyn.shape[-1] == 1 else dyn
    ones = np.ones_like(dyn3)
    out = {}
    for region, m in (("full", ones), ("dyn", dyn3), ("static", 1.0 - dyn3)):
        out[f"psnr_{region}"] = masked_psnr(pred_q, gt_q, m)
        out[f"ssim_{region}"] = masked_ssim(pred_q, gt_q, m)
        if lpips_fn is not None:
            out[f"lpips_{region}"] = float(
                lpips_fn(pred_q.astype(np.float32), gt_q.astype(np.float32), m[..., :1])
            )
    return out


class Evaluator:
    """Render + score a dataset of contract dicts.

    Args:
      models, params: GNT modules and parameters (see renderers.static_gnt).
      cfg: RenderConfig (static).
      static_mode: 'gnt' | 'geo'.
      out_dir: optional directory for per-image pickles / PNG dumps
        (mirrors the reference's infos/ + vis/ layout).
      lpips_params: optional LPIPS params (metrics.lpips_jax).
      mesh: optional jax.sharding.Mesh — renders mesh.devices.size whole
        novel views concurrently, the batch axis sharded over (dp, rp).
        This is the in-engine counterpart of the reference's one-process-
        per-GPU eval DP (run.py:161-190 + DistributedSampler): on an
        N-device platform ``run.py eval`` fills all N chips instead of one.
        None (or a 1-device mesh) = plain single-device jit.
    """

    def __init__(
        self,
        models,
        params,
        cfg: RenderConfig,
        static_mode: str = "gnt",
        out_dir: Optional[str] = None,
        lpips_params=None,
        save_vis: bool = False,
        tracker=None,
        mesh=None,
    ):
        self.models = models
        self.params = params
        self.cfg = cfg
        self.static_mode = static_mode
        self.out_dir = pathlib.Path(out_dir) if out_dir else None
        self.save_vis = save_vis

        self.mesh = mesh if (mesh is not None and mesh.devices.size > 1) else None
        self.batch_size = self.mesh.devices.size if self.mesh else 1
        if self.mesh:
            from pgdvs_tpu.parallel.sharded import make_sharded_eval_fn

            self._render_batch = make_sharded_eval_fn(
                self.mesh, models, cfg, static_mode=static_mode,
                tracker=tracker,
            )

        from pgdvs_tpu.renderers.config import compiler_options_for

        self._render = jax.jit(
            lambda params, data, key: render_novel_view(
                self.models,
                params,
                data,
                cfg,
                key,
                static_mode=static_mode,
                tracker=tracker,
            ),
            compiler_options=compiler_options_for(cfg),
        )
        if lpips_params is not None:
            from pgdvs_tpu.metrics.lpips_jax import lpips_distance

            self._lpips = jax.jit(
                lambda a, b, m: lpips_distance(lpips_params, a, b, mask=m)
            )
        else:
            self._lpips = None
        self._lpips_params = lpips_params

    @staticmethod
    def _device_data(data):
        return {
            k: jnp.asarray(v)
            for k, v in data.items()
            if k != "misc" and not isinstance(v, (str, dict))
        }

    def eval_item(self, data, item_id: str = "item", seed: int = 0) -> EvalRecord:
        t0 = time.time()
        out = self._render(
            self.params, self._device_data(data), jax.random.PRNGKey(seed)
        )
        out = jax.block_until_ready(out)
        pred = np.asarray(out["combined_rgb"])
        wall = time.time() - t0
        return self._score(pred, data, item_id, wall)

    def eval_batch(self, items) -> list:
        """Render a batch of (item_id, seed, data) on the mesh, then score.

        The batch is padded to the mesh device count by repeating the last
        item (padding renders are discarded). Each device renders whole
        views — the reference's eval DP, in-process.
        """
        assert self.mesh is not None
        t0 = time.time()
        n = len(items)
        pad = self.batch_size - n
        datas = [d for _, _, d in items] + [items[-1][2]] * pad
        seeds = [s for _, s, _ in items] + [items[-1][1]] * pad
        dev = [self._device_data(d) for d in datas]
        batch = {k: jnp.stack([d[k] for d in dev]) for k in dev[0]}
        keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
        with self.mesh:
            out = self._render_batch(self.params, batch, keys)
        preds = np.asarray(out["combined_rgb"])
        wall = (time.time() - t0) / max(n, 1)
        return [
            self._score(preds[j], data, item_id, wall)
            for j, (item_id, _, data) in enumerate(items)
        ]

    def _score(self, pred, data, item_id: str, wall: float) -> EvalRecord:
        # NaN guard (evaluator_pgdvs.py:56-68): log + zero-fill, never crash
        if not np.isfinite(pred).all():
            LOGGER.warning("non-finite render for %s; zero-filling", item_id)
            pred = np.nan_to_num(pred, nan=0.0, posinf=1.0, neginf=0.0)

        metrics = {}
        misc = data.get("misc") if isinstance(data.get("misc"), dict) else {}
        if "rgb_tgt" in data:
            if misc.get("quant_type") == "dycheck":
                metrics = compute_dycheck_metrics(
                    pred,
                    np.asarray(data["rgb_tgt"]),
                    misc.get("covisible_mask", np.asarray(data["eval_mask"])[..., :1]),
                    lpips_params=self._lpips_params,
                )
            else:
                dyn_mask = (
                    misc["tgt_dyn_mask"]
                    if "tgt_dyn_mask" in misc
                    else np.asarray(data["eval_mask"])[..., :1]
                )
                gt = np.asarray(data["rgb_tgt"])
                quantize_gt = True
                if gt.shape[:2] != pred.shape[:2]:
                    # render_stride > 1: quantize FIRST, then bicubic-
                    # antialias resize GT + nearest-resize the mask
                    # (evaluator_pgdvs.py:73-92), no re-quantization
                    gt = quantize_uint8(_to_numpy_img(gt))
                    gt, dyn_mask = resize_gt_to_render(
                        gt, dyn_mask, pred.shape[:2]
                    )
                    quantize_gt = False
                metrics = compute_nvidia_metrics(
                    pred, gt, dyn_mask, lpips_fn=self._lpips,
                    quantize_gt=quantize_gt,
                )
        metrics["render_wall_s"] = wall

        if self.out_dir is not None:
            self.out_dir.mkdir(parents=True, exist_ok=True)
            # the pickle carries the reference's join ids (scene / frame /
            # cam — evaluator_pgdvs.py:120-129 filename fields) so
            # scripts/ref_parity_compare.py can match items mechanically;
            # they stay OUT of .metrics, which the summary float-sums
            ids = {
                k: misc[k]
                for k in ("scene_id", "tgt_frame_id", "tgt_cam_id")
                if k in misc
            }
            with open(self.out_dir / f"{item_id}.pkl", "wb") as f:
                pickle.dump({**metrics, **ids}, f)
            if self.save_vis:
                import PIL.Image

                PIL.Image.fromarray(
                    (np.clip(pred, 0.0, 1.0) * 255).astype(np.uint8)
                ).save(
                    self.out_dir / f"{item_id}_combined.png"
                )
        return EvalRecord(item_id, metrics, wall)

    def run(
        self,
        dataset: Iterable,
        process_index: int = 0,
        process_count: int = 1,
        max_items: int = -1,
    ) -> dict:
        """Evaluate, striding items across processes (eval data parallelism).

        Returns mean metrics over this process's shard (plus counts so a
        driver can reduce across processes exactly like the reference's
        torch.distributed.reduce SUM).
        """
        records = []
        if hasattr(dataset, "__getitem__") and hasattr(dataset, "__len__"):
            # overlap item assembly (zip/image/npz IO) with device compute —
            # the reference's DataLoader(num_workers=N) (trainer_pgdvs.py:300)
            from pgdvs_tpu.data.loader import PrefetchLoader

            idxs = [
                i for i in range(len(dataset))
                if process_count <= 1 or i % process_count == process_index
            ]
            if max_items >= 0:
                idxs = idxs[:max_items]
            stream = zip(idxs, PrefetchLoader(dataset, indices=idxs))
        else:
            stream = (
                (i, d) for i, d in enumerate(dataset)
                if process_count <= 1 or i % process_count == process_index
            )
        if self.mesh is not None:
            # mesh eval DP: fill a batch of device-count views per step
            pending = []
            for i, data in stream:
                if 0 <= max_items <= len(records) + len(pending):
                    break
                pending.append((f"{i:06d}", i, data))
                if len(pending) == self.batch_size:
                    records.extend(self.eval_batch(pending))
                    for rec in records[-len(pending):]:
                        LOGGER.info(
                            "eval %s: %s", rec.item_id, json.dumps(rec.metrics)
                        )
                    pending = []
            if pending:
                recs = self.eval_batch(pending)
                records.extend(recs)
                for rec in recs:
                    LOGGER.info(
                        "eval %s: %s", rec.item_id, json.dumps(rec.metrics)
                    )
        else:
            for i, data in stream:
                if 0 <= max_items <= len(records):
                    break
                rec = self.eval_item(data, item_id=f"{i:06d}", seed=i)
                records.append(rec)
                LOGGER.info("eval %s: %s", rec.item_id, json.dumps(rec.metrics))
        if not records and jax.process_count() == 1:
            return {"count": 0}
        keys = sorted(records[0].metrics.keys()) if records else []
        sums = {k: float(sum(r.metrics[k] for r in records)) for k in keys}
        count = len(records)

        if jax.process_count() > 1:
            # cross-process SUM reduction — the reference's
            # torch.distributed.reduce(dst=0, SUM) (evaluator_pgdvs.py:183-186).
            # The key schema must agree across processes or allgather sees
            # mismatched shapes (a process whose shard is empty — items <
            # process_count, or max_items striding — has keys=[]). Process 0
            # always owns item 0 under the striding, so broadcast its key
            # list and let empty shards contribute zeros.
            from jax.experimental import multihost_utils

            key_blob = json.dumps(keys).encode("utf-8")
            buf = np.zeros(4096, np.uint8)
            buf[: len(key_blob)] = np.frombuffer(key_blob, np.uint8)
            buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
            keys = json.loads(bytes(buf[buf != 0]).decode("utf-8"))
            vec = np.asarray(
                [float(count)] + [sums.get(k, 0.0) for k in keys], np.float64
            )
            gathered = np.asarray(multihost_utils.process_allgather(vec))
            total = gathered.sum(axis=0)
            count = int(total[0])
            sums = {k: float(total[1 + i]) for i, k in enumerate(keys)}

        if count == 0:
            return {"count": 0}
        means = {k: v / count for k, v in sums.items()}
        return {"count": count, "sum": sums, "mean": means}
