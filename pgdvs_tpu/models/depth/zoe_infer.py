"""ZoeDepth inference protocol around the network — reference-faithful.

The reference calls ``model.infer(X)`` on raw-resolution [0, 1] images
(``compute_zoedepth.py:257``); the original ``DepthModel.infer`` wraps the
network with a specific protocol that materially changes the output
(boundary behavior, resolution mapping, flip ensembling):

  1. reflect-pad by ``int(sqrt(dim / 2) * 3)`` per side (boundary-artifact
     fix, depth_model.py);
  2. resize to the network size (384x512) with keep_aspect_ratio — "scale
     as little as possible" — rounded to multiples of 32, bilinear
     align_corners=True;
  3. run the network; average with the horizontally-flipped prediction
     (with_flip_aug default);
  4. bicubic (align_corners=False, a=-0.75) resize back to the padded
     input resolution and crop the padding.

Host-side numpy implementations of the exact torch resize semantics are
included (jax.image.resize is neither align_corners nor a=-0.75). The
geometry/resample math is A/B-tested against torch and against the HF
``ZoeDepthImageProcessor`` (itself output-parity-verified vs the original)
in tests/test_zoe_infer_ab.py.
"""

from __future__ import annotations

import math

import numpy as np


def resize_output_size(in_h, in_w, out_h, out_w, keep_aspect=True,
                       multiple=32):
    """HF get_resize_output_image_size / original midas Resize("minimal")."""

    def constrain(val):
        x = int(np.round(val / multiple) * multiple)
        if x < 0:
            x = math.ceil(val / multiple) * multiple
        return x

    scale_h = out_h / in_h
    scale_w = out_w / in_w
    if keep_aspect:
        # scale as little as possible
        if abs(1 - scale_w) < abs(1 - scale_h):
            scale_h = scale_w
        else:
            scale_w = scale_h
    return constrain(scale_h * in_h), constrain(scale_w * in_w)


def _axis_interp_ac(arr, out_n, axis):
    """Per-axis linear interp, torch align_corners=True semantics."""
    in_n = arr.shape[axis]
    if in_n == 1:
        reps = [1] * arr.ndim
        reps[axis] = out_n
        return np.tile(arr, reps)
    pos = np.arange(out_n) * ((in_n - 1) / max(out_n - 1, 1))
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, in_n - 1)
    t = (pos - lo).astype(arr.dtype)
    shape = [1] * arr.ndim
    shape[axis] = out_n
    t = t.reshape(shape)
    return np.take(arr, lo, axis=axis) * (1 - t) + np.take(
        arr, hi, axis=axis
    ) * t


def resize_bilinear_ac(img, out_h, out_w):
    """torch F.interpolate(mode='bilinear', align_corners=True), numpy."""
    img = np.asarray(img)
    return _axis_interp_ac(_axis_interp_ac(img, out_h, 0), out_w, 1)


def _cubic_weights(t, a=-0.75):
    """Cubic convolution kernel weights for the 4 taps at fractions t."""
    # distances of the 4 taps from the sample point: 1+t, t, 1-t, 2-t
    d = np.stack([1.0 + t, t, 1.0 - t, 2.0 - t])

    def k(x):
        x = np.abs(x)
        return np.where(
            x <= 1.0,
            ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
            np.where(x < 2.0, ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a,
                     0.0),
        )

    return k(d)


def _axis_interp_cubic(arr, out_n, axis):
    """Per-axis cubic interp, torch bicubic align_corners=False semantics
    (half-pixel mapping, a=-0.75, edge-clamped taps)."""
    in_n = arr.shape[axis]
    scale = in_n / out_n
    src = (np.arange(out_n) + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    t = (src - base).astype(arr.dtype)
    w = _cubic_weights(t)  # [4, out_n]
    out = None
    for tap in range(4):
        idx = np.clip(base - 1 + tap, 0, in_n - 1)
        shape = [1] * arr.ndim
        shape[axis] = out_n
        ww = w[tap].reshape(shape)
        piece = np.take(arr, idx, axis=axis) * ww
        out = piece if out is None else out + piece
    return out


def resize_bicubic(img, out_h, out_w):
    """torch F.interpolate(mode='bicubic', align_corners=False), numpy."""
    img = np.asarray(img, np.float64)
    return _axis_interp_cubic(_axis_interp_cubic(img, out_h, 0), out_w, 1)


def zoe_infer(depth_fn, img, net_hw=(384, 512), pad_input=True,
              with_flip_aug=True):
    """Run ``depth_fn`` ([H', W', 3] in [0,1] -> metric depth [H', W'])
    under the reference's infer protocol; returns depth at img's [H, W]."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    pad_h = pad_w = 0
    if pad_input:
        pad_h = int(np.sqrt(h / 2) * 3)
        pad_w = int(np.sqrt(w / 2) * 3)
        img = np.pad(img, ((pad_h, pad_h), (pad_w, pad_w), (0, 0)),
                     mode="reflect")
    ph, pw = img.shape[:2]
    nh, nw = resize_output_size(ph, pw, net_hw[0], net_hw[1])
    x = resize_bilinear_ac(img, nh, nw).astype(np.float32)

    d = np.asarray(depth_fn(x), np.float32)
    if with_flip_aug:
        d_flip = np.asarray(depth_fn(np.ascontiguousarray(x[:, ::-1])),
                            np.float32)
        d = (d + d_flip[:, ::-1]) / 2.0

    d = resize_bicubic(d, ph, pw).astype(np.float32)
    if pad_h > 0:
        d = d[pad_h:-pad_h]
    if pad_w > 0:
        d = d[:, pad_w:-pad_w]
    return d
