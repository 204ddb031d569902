"""Visualization helpers: flow color wheel, depth colorize, camera frusta.

Equivalents of the reference's ``flow_vis_utils.py`` (Baker et al. flow
color wheel), ``vis_utils.py`` colorize, and camera-frustum point export.
"""

from __future__ import annotations

import numpy as np


def _make_color_wheel():
    """Middlebury flow color wheel (55 colors)."""
    ry, yg, gc, cb, bm, mr = 15, 6, 4, 11, 13, 6
    ncols = ry + yg + gc + cb + bm + mr
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:ry, 0] = 255
    wheel[0:ry, 1] = np.floor(255 * np.arange(ry) / ry)
    col += ry
    wheel[col : col + yg, 0] = 255 - np.floor(255 * np.arange(yg) / yg)
    wheel[col : col + yg, 1] = 255
    col += yg
    wheel[col : col + gc, 1] = 255
    wheel[col : col + gc, 2] = np.floor(255 * np.arange(gc) / gc)
    col += gc
    wheel[col : col + cb, 1] = 255 - np.floor(255 * np.arange(cb) / cb)
    wheel[col : col + cb, 2] = 255
    col += cb
    wheel[col : col + bm, 2] = 255
    wheel[col : col + bm, 0] = np.floor(255 * np.arange(bm) / bm)
    col += bm
    wheel[col : col + mr, 2] = 255 - np.floor(255 * np.arange(mr) / mr)
    wheel[col : col + mr, 0] = 255
    return wheel


_WHEEL = _make_color_wheel()


def flow_to_color(flow, clip_flow=None):
    """[H, W, 2] flow -> uint8 [H, W, 3] Middlebury color coding.

    Bit-exact with the reference ``flow_vis_utils.flow_to_image``
    (``flow_vis_utils.py:110-135``), including its quirks: ``clip_flow``
    clips to [0, clip] (negatives zeroed, not mirrored), normalization is
    by ``rad_max + 1e-5``, and the radius fed to the wheel is recomputed
    from the normalized components (so the >1 desaturation branch of
    ``flow_uv_to_colors`` stays reachable only for direct callers).
    A/B: tests/test_flow_vis_ab.py.
    """
    if clip_flow is not None:
        flow = np.clip(flow, 0, clip_flow)
    u = flow[..., 0]
    v = flow[..., 1]
    rad_max = np.sqrt(u**2 + v**2).max()
    u = u / (rad_max + 1e-5)
    v = v / (rad_max + 1e-5)
    return flow_uv_to_colors(u, v)


def flow_uv_to_colors(u, v):
    """Normalized flow components -> wheel colors (flow_vis_utils.py:71-107)."""
    rad = np.sqrt(u**2 + v**2)
    ncols = _WHEEL.shape[0]
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(np.int32)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    img = np.zeros(u.shape + (3,), np.uint8)
    over = rad > 1
    for c in range(3):
        col0 = _WHEEL[k0, c] / 255.0
        col1 = _WHEEL[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        col = np.where(over, col * 0.75, 1 - rad * (1 - col))
        img[..., c] = np.floor(255 * col)
    return img


def colorize_depth(depth, mask=None, cmap: str = "turbo", q_lo=0.02, q_hi=0.98):
    """Depth map -> uint8 color image via quantile-normalized colormap."""
    import matplotlib

    d = np.asarray(depth, np.float64)
    valid = np.isfinite(d) if mask is None else (np.asarray(mask) > 0) & np.isfinite(d)
    if valid.sum() == 0:
        return np.zeros(d.shape + (3,), np.uint8)
    lo, hi = np.quantile(d[valid], [q_lo, q_hi])
    norm = np.clip((d - lo) / max(hi - lo, 1e-8), 0, 1)
    cm = matplotlib.colormaps[cmap]
    rgb = cm(norm)[..., :3]
    rgb[~valid] = 0
    return (rgb * 255).astype(np.uint8)


def camera_frustum_points(w2c, scale: float = 0.1, n: int = 32):
    """Point samples along a camera frustum wireframe (ply export helper,
    reference vis_utils.py:212-260)."""
    c2w = np.linalg.inv(w2c)
    corners = (
        np.array(
            [
                [0, 0, 0],
                [-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2],
            ]
        )
        * scale
    )
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    pts = []
    for a, b in edges:
        t = np.linspace(0, 1, n)[:, None]
        pts.append(corners[a] * (1 - t) + corners[b] * t)
    pts = np.concatenate(pts)
    homo = np.concatenate([pts, np.ones((len(pts), 1))], 1)
    return (c2w @ homo.T).T[:, :3]


def save_ply_points(path, points, colors=None):
    """Minimal ascii PLY point-cloud writer (debug exports)."""
    points = np.asarray(points)
    n = len(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write(
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            )
        f.write("end_header\n")
        if colors is not None:
            colors = np.clip(np.asarray(colors) * 255, 0, 255).astype(np.uint8)
            for p, c in zip(points, colors):
                f.write(f"{p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")
        else:
            for p in points:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")


def modify_rgb_range(img, src_range: str, tgt_range: str):
    """Convert between '0_1', '-1_1', '0_255' image ranges (reference
    rendering.py:26-77)."""
    if src_range == tgt_range:
        return img
    # to 0_1
    if src_range == "0_255":
        img = img / 255.0
    elif src_range == "-1_1":
        img = (img + 1.0) / 2.0
    elif src_range != "0_1":
        raise ValueError(src_range)
    # from 0_1
    if tgt_range == "0_255":
        return img * 255.0
    if tgt_range == "-1_1":
        return img * 2.0 - 1.0
    if tgt_range == "0_1":
        return img
    raise ValueError(tgt_range)
