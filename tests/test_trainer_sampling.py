"""Trainer ray-batch samplers (fast lane, host-only numpy)."""

import numpy as np
import pytest

from pgdvs_tpu.data.synthetic import make_contract_data
from pgdvs_tpu.engines.trainer import sample_ray_batch, sample_ray_batch_src


@pytest.fixture(scope="module")
def data():
    return make_contract_data(h=16, w=20, n_spatial=4, n_frames=6)


def test_src_sampler_never_touches_target(data):
    """train_on='src' must not read the held-out eval pixels: its target is
    one of the source views and rgb_gt comes from that view's image."""
    rng = np.random.default_rng(0)
    poisoned = dict(data)
    poisoned["rgb_tgt"] = np.full_like(np.asarray(data["rgb_tgt"]), -7.0)
    b = sample_ray_batch_src(rng, poisoned, n_rays=64)
    assert (b["rgb_gt"] != -7.0).all()
    # target cam is one of the source cams, excluded from the batch sources
    src = np.asarray(data["flat_cam_src_spatial"])
    matches = [i for i in range(src.shape[0]) if np.allclose(b["tgt_cam"], src[i])]
    assert len(matches) == 1
    assert b["src_cams"].shape[0] == src.shape[0] - 1
    assert not any(
        np.allclose(b["tgt_cam"], b["src_cams"][i])
        for i in range(b["src_cams"].shape[0])
    )
    # rgb_gt pixels come from the held-out view's own image
    j = matches[0]
    view = np.asarray(data["rgb_src_spatial"])[j].reshape(-1, 3)
    assert all(
        (view == px).all(1).any() for px in np.asarray(b["rgb_gt"])
    )


def test_src_sampler_prefers_static_pixels(data):
    """With a dyn mask present, rays are drawn from static pixels only."""
    rng = np.random.default_rng(1)
    masks = np.asarray(data.get("dyn_mask_src_spatial"))
    assert masks is not None and masks.max() > 0  # fixture has dynamics
    b = sample_ray_batch_src(rng, data, n_rays=32)
    src = np.asarray(data["flat_cam_src_spatial"])
    j = next(
        i for i in range(src.shape[0]) if np.allclose(b["tgt_cam"], src[i])
    )
    dyn_px = np.asarray(data["rgb_src_spatial"])[j].reshape(-1, 3)[
        masks[j].reshape(-1) > 0
    ]
    # no sampled gt pixel comes from a dynamic location (pixel-value check:
    # the synthetic scene's dynamic square is a distinct flat color)
    for px in np.asarray(b["rgb_gt"]):
        assert not (np.abs(dyn_px - px) < 1e-6).all(1).any() or (
            # unless that color also appears in the static region
            (np.abs(
                np.asarray(data["rgb_src_spatial"])[j].reshape(-1, 3)[
                    masks[j].reshape(-1) == 0
                ]
                - px
            ) < 1e-6).all(1).any()
        )


def test_tgt_sampler_layout(data):
    rng = np.random.default_rng(2)
    b = sample_ray_batch(rng, data, n_rays=48)
    assert b["rays_o"].shape == (48, 3) and b["rays_d"].shape == (48, 3)
    assert b["depth_range"].shape == (48, 2)
    assert (b["depth_range"][:, 1] > b["depth_range"][:, 0]).all()
    np.testing.assert_allclose(b["tgt_cam"], np.asarray(data["flat_cam_tgt"]))


def test_src_sampler_needs_two_views(data):
    one = dict(data)
    one["flat_cam_src_spatial"] = np.asarray(data["flat_cam_src_spatial"])[:1]
    one["rgb_src_spatial"] = np.asarray(data["rgb_src_spatial"])[:1]
    with pytest.raises(ValueError):
        sample_ray_batch_src(np.random.default_rng(0), one, n_rays=8)
