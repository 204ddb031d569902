"""Visualization engine — renders trajectories and assembles videos.

TPU counterpart of ``/root/reference/pgdvs/engines/visualizer_pgdvs.py``:
renders each trajectory item, writes ``<idx>_combined.png`` (+ per-branch
intermediates) and assembles an mp4 via imageio-ffmpeg when available
(skipped gracefully otherwise, mirroring the reference's ffmpeg detection,
``visualizer_pgdvs.py:30-41``).
"""

from __future__ import annotations

import logging
import pathlib
from typing import Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from pgdvs_tpu.renderers.compose import render_novel_view
from pgdvs_tpu.renderers.config import RenderConfig

LOGGER = logging.getLogger(__name__)


def images_to_video(img_dir, pattern: str, out_f, fps: int = 10):
    """Assemble PNGs into an mp4; returns False when ffmpeg is missing."""
    try:
        import imageio.v2 as imageio
        import imageio_ffmpeg  # noqa: F401
    except ImportError:
        LOGGER.warning("imageio-ffmpeg unavailable; skipping video export")
        return False
    files = sorted(pathlib.Path(img_dir).glob(pattern))
    if not files:
        return False
    writer = imageio.get_writer(str(out_f), fps=fps)
    for f in files:
        writer.append_data(imageio.imread(f))
    writer.close()
    return True


class Visualizer:
    def __init__(
        self,
        models,
        params,
        cfg: RenderConfig,
        out_dir,
        static_mode: str = "gnt",
        fps: int = 10,
    ):
        self.models = models
        self.params = params
        self.cfg = cfg
        self.static_mode = static_mode
        self.out_dir = pathlib.Path(out_dir)
        self.fps = fps
        from pgdvs_tpu.renderers.config import compiler_options_for

        self._render = jax.jit(
            lambda params, data, key: render_novel_view(
                models, params, data, cfg, key, static_mode=static_mode
            ),
            compiler_options=compiler_options_for(cfg),
        )

    def run(self, dataset: Iterable, save_keys=("combined_rgb",)) -> pathlib.Path:
        import PIL.Image

        self.out_dir.mkdir(parents=True, exist_ok=True)
        if hasattr(dataset, "__getitem__") and hasattr(dataset, "__len__"):
            # prefetch trajectory frames while the chip renders — the
            # reference's DataLoader(num_workers) (visualizer_pgdvs.py:53-57)
            from pgdvs_tpu.data.loader import PrefetchLoader

            dataset = PrefetchLoader(dataset)
        for i, data in enumerate(dataset):
            dev = {
                k: jnp.asarray(v)
                for k, v in data.items()
                if not isinstance(v, (dict, str))
            }
            out = self._render(self.params, dev, jax.random.PRNGKey(i))
            for key in save_keys:
                img = np.clip(np.asarray(out[key]), 0.0, 1.0)
                suffix = "combined" if key == "combined_rgb" else key
                PIL.Image.fromarray((img * 255).astype(np.uint8)).save(
                    self.out_dir / f"{i:06d}_{suffix}.png"
                )
            LOGGER.info("vis frame %d done", i)
        images_to_video(
            self.out_dir, "*_combined.png", self.out_dir / "video_combined.mp4",
            fps=self.fps,
        )
        return self.out_dir
