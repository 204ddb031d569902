"""Track-branch tests: stack building, query selection, occluded-point
recovery on the synthetic scene."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # track-branch e2e renders

from pgdvs_tpu.data import synthetic
from pgdvs_tpu.models.tracking import LucasKanadeTracker
from pgdvs_tpu.renderers.config import RenderConfig
from pgdvs_tpu.renderers.dynamic import render_dynamic
from pgdvs_tpu.renderers.dynamic_track import build_track_stack, select_queries

H, W = 48, 64
K_TRACK = 2


def _track_data():
    """Contract data + track sources from the synthetic scene."""
    data = synthetic.make_contract_data(
        h=H, w=W, n_spatial=3, n_frames=8, tgt_time=0.5
    )
    times = np.linspace(0.0, 1.0, 8)
    poses = [synthetic.camera_pose(i, 8) for i in range(8)]
    frames = [synthetic.render_frame(H, W, poses[i], times[i]) for i in range(8)]
    k = synthetic.intrinsics(H, W)

    from pgdvs_tpu.core.cameras import make_flat_cam

    def bundle(ids):
        return (
            np.stack([frames[i]["rgb"] for i in ids]),
            np.stack([frames[i]["dyn_mask"] for i in ids]),
            np.stack([frames[i]["depth"] for i in ids]),
            np.stack(
                [np.asarray(make_flat_cam(H, W, k, poses[i]), np.float32) for i in ids]
            ),
            np.asarray([times[i] for i in ids], np.float32),
        )

    # temporal frames are 3, 4 (tgt_time=0.5); fwd track = [1, 2]; bwd = [5, 6]
    for name, ids, n_act in (("fwd", [1, 2], 2), ("bwd", [5, 6], 2)):
        rgb, mask, depth, cam, t = bundle(ids)
        data[f"rgb_src_track_{name}"] = rgb
        data[f"dyn_mask_src_track_{name}"] = mask
        data[f"depth_src_track_{name}"] = depth
        data[f"flat_cam_src_track_{name}"] = cam
        data[f"time_src_track_{name}"] = t
        data[f"n_actual_src_track_{name}"] = np.array([n_act], np.int64)
    return data


@pytest.fixture(scope="module")
def data():
    return _track_data()


def _dev(d):
    return {k: jnp.asarray(v) for k, v in d.items() if not isinstance(v, (dict, str))}


def test_build_track_stack_layout(data):
    stack = build_track_stack(_dev(data))
    assert stack["rgbs"].shape[0] == 2 * K_TRACK + 2
    assert stack["idx_temporal"] == (K_TRACK, K_TRACK + 1)
    rt = np.asarray(stack["real_track"])
    assert rt.tolist() == [True, True, False, False, True, True]
    # time ordering: fwd < temporal < bwd
    t = np.asarray(stack["times"])
    assert t[0] < t[2] < t[4]


def test_select_queries_picks_dynamic_pixels(data):
    stack = build_track_stack(_dev(data))
    queries, valid = select_queries(stack, 64)
    queries, valid = np.asarray(queries), np.asarray(valid)
    assert queries.shape == (6 * 64, 3)
    # temporal slots (frames 2, 3) generate no valid queries
    frame_of = queries[:, 0].astype(int)
    assert not valid[(frame_of == 2) | (frame_of == 3)].any()
    # valid queries sit on dynamic pixels of their frame
    masks = np.asarray(stack["masks"])
    for q, v in zip(queries[valid], np.ones(valid.sum())):
        t, x, y = int(q[0]), int(q[1]), int(q[2])
        assert masks[t, y, x, 0] > 0


def test_default_capacity_covers_all_dyn_pixels(data):
    """The default capacity (track_queries_per_frame=0 -> H*W) must issue a
    valid query for EVERY dyn-mask pixel — the reference tracks all of them
    (pgdvs_renderer_dyn_track.py:480-488). Regression: a fixed 2048 cap used
    to silently drop trackable pixels when a dynamic region exceeded it."""
    d = _dev(data)
    # inflate the dynamic region of a track frame past any fixed small cap
    big = np.zeros((2, H, W, 1), np.float32)
    big[0] = 1.0  # all H*W = 3072 pixels dynamic (> the old 2048 cap)
    d["dyn_mask_src_track_fwd"] = jnp.asarray(big)
    stack = build_track_stack(d)
    cfg = RenderConfig()
    q_cap = cfg.track_queries_per_frame or H * W
    queries, valid = select_queries(stack, q_cap)
    queries, valid = np.asarray(queries), np.asarray(valid)
    n_valid_f0 = valid[queries[:, 0].astype(int) == 0].sum()
    assert n_valid_f0 == H * W  # every dyn pixel queried, none dropped


def test_track_branch_renders_occluded_content(data):
    cfg = RenderConfig(
        dyn_render_track_temporal="no_tgt",
        knn_tile=512,
        dyn_render_pcl_pt_radius=0.08,
    )
    tracker = LucasKanadeTracker()
    dev = _dev(data)
    out = render_dynamic(dev, cfg, jax.random.PRNGKey(0), tracker=tracker)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert np.isfinite(np.asarray(out["temporal_track_rgb"])).all()
    # final mask covers at least the splat mask
    assert (
        np.asarray(out["mask"]).sum()
        >= np.asarray(out["temporal_closest_mask"]).sum() - 1e-3
    )


def test_track_branch_no_queries_is_clean(data):
    """All-static track frames -> track render contributes nothing."""
    d = _dev(data)
    d["dyn_mask_src_track_fwd"] = jnp.zeros_like(d["dyn_mask_src_track_fwd"])
    d["dyn_mask_src_track_bwd"] = jnp.zeros_like(d["dyn_mask_src_track_bwd"])
    cfg = RenderConfig(dyn_render_track_temporal="no_tgt", knn_tile=512)
    out = render_dynamic(d, cfg, jax.random.PRNGKey(0), tracker=LucasKanadeTracker())
    assert np.isfinite(np.asarray(out["rgb"])).all()
