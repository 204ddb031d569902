"""ZoeDepth inference-protocol A/B vs torch / the HF image processor.

Validates the host-side resample math in ``models/depth/zoe_infer.py``
(torch bilinear align_corners=True, torch bicubic align_corners=False with
a=-0.75, the keep-aspect multiple-of-32 size rule, the reflect-pad amounts)
and the END-TO-END infer wrapper against the HF pipeline
(``ZoeDepthImageProcessor`` preprocess + flipped forward +
``post_process_depth_estimation``), which is itself parity-verified against
the original ``DepthModel.infer`` the reference calls
(``compute_zoedepth.py:257``).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pgdvs_tpu.models.depth.zoe_infer import (
    resize_bicubic,
    resize_bilinear_ac,
    resize_output_size,
    zoe_infer,
)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((288, 550), (384, 512)),
    ((480, 640), (384, 512)),
    ((1024, 576), (384, 512)),
    ((384, 512), (384, 512)),
])
def test_resize_output_size_matches_hf(in_hw, out_hw):
    from transformers.models.zoedepth.image_processing_zoedepth import (
        get_resize_output_image_size,
    )

    dummy = np.zeros((in_hw[0], in_hw[1], 3), np.float32)
    ref = get_resize_output_image_size(
        dummy, out_hw, keep_aspect_ratio=True, multiple=32,
        input_data_format="channels_last",
    )
    assert resize_output_size(*in_hw, *out_hw) == tuple(ref)


@pytest.mark.parametrize("shape,out", [((13, 17), (29, 31)),
                                       ((32, 48), (20, 24))])
def test_bilinear_ac_matches_torch(shape, out):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape + (3,)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(np.transpose(x, (2, 0, 1))[None]),
        size=out, mode="bilinear", align_corners=True,
    ).numpy()[0].transpose(1, 2, 0)
    np.testing.assert_allclose(resize_bilinear_ac(x, *out), ref, atol=1e-5)


@pytest.mark.parametrize("shape,out", [((13, 17), (29, 31)),
                                       ((40, 52), (21, 23)),
                                       ((16, 20), (64, 80))])
def test_bicubic_matches_torch(shape, out):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(shape).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x)[None, None].double(),
        size=out, mode="bicubic", align_corners=False,
    ).numpy()[0, 0]
    np.testing.assert_allclose(resize_bicubic(x, *out), ref, atol=1e-10)


def test_zoe_infer_matches_hf_pipeline():
    """End-to-end protocol on a deterministic toy 'network': our zoe_infer
    vs HF preprocess (pad+resize) -> forward(+flip) -> post_process."""
    from transformers.models.zoedepth.image_processing_zoedepth import (
        ZoeDepthImageProcessor,
    )

    class _Out:  # minimal stand-in for ZoeDepthDepthEstimatorOutput
        def __init__(self, d):
            self.predicted_depth = d

    def toy_net_np(x):  # [H', W', 3] -> [H', W'], asymmetric + nonlinear
        h, w = x.shape[:2]
        gx = np.linspace(0, 1, w, dtype=np.float32)[None, :]
        return x[..., 0] * gx + np.sin(3.0 * x[..., 1]) + 0.1 * x[..., 2] ** 2

    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (120, 160, 3)).astype(np.float32)

    proc = ZoeDepthImageProcessor(
        do_rescale=False, do_normalize=False, do_pad=True, do_resize=True,
        size={"height": 96, "width": 128}, keep_aspect_ratio=True,
        ensure_multiple_of=32,
    )
    pixel = proc.preprocess(
        np.transpose(img, (2, 0, 1)), input_data_format="channels_first",
        return_tensors="np",
    )["pixel_values"][0].transpose(1, 2, 0)
    d = torch.from_numpy(toy_net_np(pixel)[None])
    d_flip = torch.from_numpy(
        toy_net_np(np.ascontiguousarray(pixel[:, ::-1]))[None]
    )
    ref = proc.post_process_depth_estimation(
        _Out(d), outputs_flipped=_Out(d_flip), source_sizes=[(120, 160)],
    )[0]["predicted_depth"].numpy()

    got = zoe_infer(toy_net_np, img, net_hw=(96, 128))
    assert got.shape == ref.shape == (120, 160)
    np.testing.assert_allclose(got, ref, atol=1e-4)
