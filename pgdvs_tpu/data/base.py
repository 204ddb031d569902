"""Shared dataset machinery: zip lazy readers, crop/K bookkeeping.

Counterparts of the reference's BaseDataset utilities
(``/root/reference/pgdvs/datasets/base.py``): the released benchmark data
ships as zip archives read through a lazily-opened handle per process
(``base.py:27-30``), and crops renormalize the camera intrinsics
(``modify_K_wrt_crop_func``, ``base.py:549-568``).
"""

from __future__ import annotations

import io
import zipfile
from typing import Optional

import numpy as np


class ZipReader:
    """Lazily-opened zip archive reader.

    The open/close overhead dominates per-item reads, so the handle opens on
    first use and stays open (one handle per process/worker — zipfile
    handles are not safely shareable across forked workers, matching the
    reference's per-worker lazy open).
    """

    def __init__(self, path):
        self.path = str(path)
        self._zf: Optional[zipfile.ZipFile] = None

    def _zip(self) -> zipfile.ZipFile:
        if self._zf is None:
            self._zf = zipfile.ZipFile(self.path)
        return self._zf

    def namelist(self):
        return self._zip().namelist()

    def exists(self, name: str) -> bool:
        try:
            self._zip().getinfo(name)
            return True
        except KeyError:
            return False

    def read_bytes(self, name: str) -> bytes:
        return self._zip().read(name)

    def read_image(self, name: str) -> np.ndarray:
        """Decode an image file from the archive to [H, W, C] uint8."""
        import PIL.Image

        with PIL.Image.open(io.BytesIO(self.read_bytes(name))) as im:
            return np.asarray(im)

    def read_npz(self, name: str) -> dict:
        with np.load(io.BytesIO(self.read_bytes(name)), allow_pickle=False) as z:
            return {k: z[k] for k in z.files}

    def read_npy(self, name: str) -> np.ndarray:
        return np.load(io.BytesIO(self.read_bytes(name)), allow_pickle=False)

    def close(self):
        if self._zf is not None:
            self._zf.close()
            self._zf = None

    # pickling (dataloader workers) drops the handle; it reopens lazily
    def __getstate__(self):
        return {"path": self.path}

    def __setstate__(self, state):
        self.path = state["path"]
        self._zf = None


def modify_K_wrt_crop(k_normalized, raw_shape, crop_hw_start, crop_hw):
    """Renormalize a resolution-normalized K after a crop.

    Exact math of ``modify_K_wrt_crop_func`` (base.py:549-568): denormalize
    by the raw (pre-crop) resolution, shift the principal point by the crop
    start, renormalize by the crop size.

    Args:
      k_normalized: [3+, 3+] intrinsics with row 0 normalized by width and
        row 1 by height.
      raw_shape: (h, w) of the image K was normalized against.
      crop_hw_start: (h_start, w_start) crop origin.
      crop_hw: (crop_h, crop_w).

    Returns the renormalized K (same shape, copy).
    """
    raw_h, raw_w = raw_shape
    h_start, w_start = crop_hw_start
    crop_h, crop_w = crop_hw
    k = np.array(k_normalized, np.float64, copy=True)
    k[0, :] *= raw_w
    k[1, :] *= raw_h
    k[0, 2] -= w_start
    k[1, 2] -= h_start
    k[0, :] /= crop_w
    k[1, :] /= crop_h
    return k


def center_crop(img: np.ndarray, crop_h: int, crop_w: int):
    """Center crop with the crop_info bookkeeping the K-renorm consumes.

    Returns (cropped, {"h_start", "w_start", "crop_h", "crop_w"}).
    """
    h, w = img.shape[:2]
    h0 = max((h - crop_h) // 2, 0)
    w0 = max((w - crop_w) // 2, 0)
    out = img[h0 : h0 + crop_h, w0 : w0 + crop_w]
    return out, {
        "h_start": h0,
        "w_start": w0,
        "crop_h": out.shape[0],
        "crop_w": out.shape[1],
    }
