"""Flow color-wheel A/B vs the REFERENCE ``flow_vis_utils.flow_to_image``.

Pure-numpy on both sides — asserts bit-identical uint8 images across the
flow regimes the visualizers emit (small/large magnitudes, zeros, the
asymmetric [0, clip] clipping quirk, and the >1-radius desaturation branch
of ``flow_uv_to_colors``).
"""

import importlib.util
import sys

import numpy as np
import pytest

REF_FLOW_VIS = "/root/reference/pgdvs/utils/flow_vis_utils.py"


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_flow_vis", REF_FLOW_VIS)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference flow_vis_utils unavailable: {e}")
    return mod


def _flows():
    rng = np.random.default_rng(11)
    yield rng.normal(size=(24, 32, 2)).astype(np.float32) * 3.0
    yield rng.normal(size=(8, 8, 2)).astype(np.float32) * 200.0
    yield np.zeros((5, 7, 2), np.float32)
    f = rng.normal(size=(16, 16, 2)).astype(np.float32)
    f[0, 0] = [1e-7, -1e-7]
    yield f


def test_flow_to_color_bitexact(ref):
    from pgdvs_tpu.utils.vis import flow_to_color

    for flow in _flows():
        np.testing.assert_array_equal(
            flow_to_color(flow), ref.flow_to_image(flow)
        )


def test_flow_to_color_clip_quirk(ref):
    """clip_flow clips to [0, clip] — negatives zeroed (flow_vis_utils.py:126)."""
    from pgdvs_tpu.utils.vis import flow_to_color

    rng = np.random.default_rng(3)
    flow = rng.normal(size=(12, 12, 2)).astype(np.float32) * 10
    np.testing.assert_array_equal(
        flow_to_color(flow, clip_flow=4.0),
        ref.flow_to_image(flow, clip_flow=4.0),
    )


def test_flow_uv_to_colors_over_unit_radius(ref):
    """Direct callers can pass unnormalized components; radius >1 takes the
    0.75-desaturation branch (flow_vis_utils.py:103)."""
    from pgdvs_tpu.utils.vis import flow_uv_to_colors

    rng = np.random.default_rng(5)
    u = rng.normal(size=(10, 10)) * 2
    v = rng.normal(size=(10, 10)) * 2
    np.testing.assert_array_equal(
        flow_uv_to_colors(u, v), ref.flow_uv_to_colors(u, v)
    )
