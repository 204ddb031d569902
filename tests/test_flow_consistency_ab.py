"""Flow cycle-consistency A/B vs the reference ``compute_occlusion``
(``/root/reference/pgdvs/preprocess/common.py:277-325``). The occlusion
masks it produces gate every dataset's flow usage (``coord_diff``
thresholding), and its backward-flow lookup mixes grid conventions
(normalize by W-1, sample with align_corners=False), i.e. reads at
``u * W/(W-1) - 0.5`` — a near-edge shift a formula-level test would miss.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"


def test_flow_roundtrip_matches_reference():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from pgdvs.preprocess.common import compute_occlusion
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference common unavailable: {e}")

    from pgdvs_tpu.preprocess.flow_consistency import (
        flow_roundtrip,
        occlusion_mask,
    )

    rng = np.random.default_rng(21)
    h, w = 40, 52
    import jax

    def smooth(ch):
        small = rng.uniform(-6, 6, (h // 4, w // 4, ch))
        return np.asarray(
            jax.image.resize(jnp.asarray(small, jnp.float32), (h, w, ch),
                             "linear")
        )

    flow12 = smooth(2)
    flow21 = smooth(2)

    img1 = torch.zeros((1, 3, h, w))
    t = lambda f: torch.tensor(f).permute(2, 0, 1)[None]
    with torch.no_grad():
        ref_diff, ref_err = compute_occlusion(
            img1, t(flow12), t(flow21), return_raw=True
        )
        ref_occ = compute_occlusion(img1, t(flow12), t(flow21), occ_thresh=1.0)
    ref_diff = ref_diff[0].permute(1, 2, 0).numpy()
    ref_err = ref_err[0].numpy()

    our_diff, our_err = flow_roundtrip(jnp.asarray(flow12), jnp.asarray(flow21))
    our_occ = occlusion_mask(jnp.asarray(flow12), jnp.asarray(flow21), 1.0)

    np.testing.assert_allclose(np.asarray(our_diff), ref_diff,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(our_err), ref_err,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(our_occ).astype(np.float32), ref_occ
    )
