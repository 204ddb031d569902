"""Metric-protocol parity vs the reference implementations.

- masked PSNR/SSIM vs ``pgdvs/utils/training.py:281-346`` (numpy/skimage,
  directly importable);
- NSFF LPIPS (the NVIDIA-protocol perceptual metric) vs the vendored
  ``pgdvs/utils/nsff_lpips`` network: torchvision is stubbed with the
  standard AlexNet feature stack (random weights), the LEARNED linear heads
  come from the reference's bundled ``weights/v0.1/alex.pth``, and the jax
  implementation must reproduce the torch distances (masked and unmasked).
"""

import sys
import importlib.machinery
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"


@pytest.fixture(autouse=True)
def _unstub_skimage_after():
    """Remove the skimage stub after every test in this module: leaking it
    through sys.modules made every LATER module's masked_ssim call hit the
    raising stub instead of the ImportError fallback (the round-5 suite
    failure in test_ref_parity_compare)."""
    yield
    if getattr(sys.modules.get("skimage"), "__version__", "") == "0.0-stub":
        for name in ("skimage", "skimage.metrics", "skimage.transform",
                     "skimage.color"):
            sys.modules.pop(name, None)


def _stub_skimage():
    """skimage is not installed here; the reference's training.py imports it
    at module scope. Stub `skimage.metrics.structural_similarity` (unused by
    the PSNR test) so the module loads."""
    if "skimage" in sys.modules:
        return
    sk = types.ModuleType("skimage")
    sk.__spec__ = importlib.machinery.ModuleSpec("skimage", None)
    met = types.ModuleType("skimage.metrics")
    met.__spec__ = importlib.machinery.ModuleSpec("skimage.metrics", None)

    def structural_similarity(*a, **k):  # pragma: no cover
        raise NotImplementedError("skimage stub")

    met.structural_similarity = structural_similarity
    sk.metrics = met
    tr = types.ModuleType("skimage.transform")
    tr.__spec__ = importlib.machinery.ModuleSpec("skimage.transform", None)
    tr.resize = lambda *a, **k: (_ for _ in ()).throw(NotImplementedError)
    col = types.ModuleType("skimage.color")
    col.__spec__ = importlib.machinery.ModuleSpec("skimage.color", None)
    for name in ("rgb2lab", "lab2rgb", "rgb2gray"):
        setattr(col, name, lambda *a, **k: (_ for _ in ()).throw(
            NotImplementedError))
    sk.transform = tr
    sk.color = col
    sk.__version__ = "0.0-stub"
    sys.modules["skimage"] = sk
    sys.modules["skimage.metrics"] = met
    sys.modules["skimage.transform"] = tr
    sys.modules["skimage.color"] = col


def test_masked_psnr_matches_reference():
    _stub_skimage()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from pgdvs.utils.training import calculate_psnr
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference metrics unavailable: {e}")
    from pgdvs_tpu.metrics.psnr_ssim import masked_psnr

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (24, 30, 3))
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1)
    mask = np.repeat(
        (rng.uniform(size=(24, 30, 1)) > 0.4).astype(np.float64), 3, axis=2
    )
    assert np.isclose(masked_psnr(a, b, mask), calculate_psnr(a, b, mask))


def _stub_torchvision(torch):
    """Standard AlexNet feature stack (the torchvision layout LPIPS slices)."""
    import torch.nn as tnn

    class _AlexNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(
                tnn.Conv2d(3, 64, 11, stride=4, padding=2),
                tnn.ReLU(inplace=True),
                tnn.MaxPool2d(3, 2),
                tnn.Conv2d(64, 192, 5, padding=2),
                tnn.ReLU(inplace=True),
                tnn.MaxPool2d(3, 2),
                tnn.Conv2d(192, 384, 3, padding=1),
                tnn.ReLU(inplace=True),
                tnn.Conv2d(384, 256, 3, padding=1),
                tnn.ReLU(inplace=True),
                tnn.Conv2d(256, 256, 3, padding=1),
                tnn.ReLU(inplace=True),
            )

    mod = types.ModuleType("torchvision")
    mod.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    models = types.ModuleType("torchvision.models")
    models.__spec__ = importlib.machinery.ModuleSpec("torchvision.models", None)

    def alexnet(pretrained=False, **kw):
        torch.manual_seed(0)
        return _AlexNet()

    models.alexnet = alexnet
    # LPIPS also references vgg16/squeezenet lazily for other net types
    mod.models = models
    sys.modules.setdefault("torchvision", mod)
    sys.modules.setdefault("torchvision.models", models)


def test_nsff_lpips_parity():
    torch = pytest.importorskip("torch")
    _stub_skimage()
    _stub_torchvision(torch)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from pgdvs.utils.nsff_lpips.networks_basic import PNetLin
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference nsff_lpips unavailable: {e}")

    net = PNetLin(
        pnet_type="alex", pnet_rand=True, use_dropout=True, spatial=False,
        version="0.1", lpips=True,
    )
    # learned linear heads: the reference's bundled checkpoint
    lin_sd = torch.load(
        f"{REF}/pgdvs/utils/nsff_lpips/weights/v0.1/alex.pth",
        map_location="cpu", weights_only=True,
    )
    net.load_state_dict(lin_sd, strict=False)
    net.eval()

    # port the SAME weights into the jax implementation
    from pgdvs_tpu.metrics.lpips_jax import lpips_distance

    sd = net.state_dict()
    slices = {  # NSFF slices convs at features indices 0,3,6,8,10
        0: "net.slice1.0", 1: "net.slice2.3", 2: "net.slice3.6",
        3: "net.slice4.8", 4: "net.slice5.10",
    }
    params = {}
    for i, key in slices.items():
        params[f"conv{i}_w"] = jnp.asarray(
            sd[f"{key}.weight"].numpy().transpose(2, 3, 1, 0)
        )
        params[f"conv{i}_b"] = jnp.asarray(sd[f"{key}.bias"].numpy())
        params[f"lin{i}"] = jnp.asarray(
            sd[f"lin{i}.model.1.weight"].numpy().reshape(-1)
        )

    rng = np.random.default_rng(1)
    img0 = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape), 0, 1).astype(
        np.float32
    )
    mask = (rng.uniform(size=(48, 64, 1)) > 0.3).astype(np.float32)

    t0 = torch.tensor(2 * img0 - 1).permute(2, 0, 1)[None]
    t1 = torch.tensor(2 * img1 - 1).permute(2, 0, 1)[None]
    with torch.no_grad():
        ref_plain = float(net(t0, t1).reshape(-1)[0])
        ref_masked = float(
            net(t0, t1, mask=torch.tensor(mask).permute(2, 0, 1)[None])
            .reshape(-1)[0]
        )

    got_plain = float(lpips_distance(params, jnp.asarray(img0), jnp.asarray(img1)))
    got_masked = float(
        lpips_distance(
            params, jnp.asarray(img0), jnp.asarray(img1), mask=jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(got_plain, ref_plain, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(got_masked, ref_masked, rtol=1e-3, atol=1e-5)


def _stub_lpips_pkg():
    """the pip `lpips` package is absent; the reference dycheck metrics
    module imports it at module scope (only used by compute_lpips)."""
    if "lpips" in sys.modules:
        return
    mod = types.ModuleType("lpips")
    mod.__spec__ = importlib.machinery.ModuleSpec("lpips", None)

    class LPIPS:  # pragma: no cover
        def __init__(self, *a, **k):
            raise NotImplementedError("lpips stub")

    mod.LPIPS = LPIPS
    sys.modules["lpips"] = mod


def test_dycheck_psnr_ssim_match_reference():
    _stub_skimage()
    _stub_lpips_pkg()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from pgdvs.utils.dycheck import metrics as ref_metrics
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference dycheck metrics unavailable: {e}")
    from pgdvs_tpu.metrics import dycheck as dm

    # the reference's CPU branch has a typo (`tmp_deivce`,
    # metrics.py:84-85) and only runs on GPU machines; shim its module
    # globals so the "gpu" branch resolves to the CPU device
    class _JaxShim:
        def __getattr__(self, k):
            return getattr(jax, k)

        @staticmethod
        def devices(kind=None):
            return jax.devices("cpu")

    ref_metrics.jax = _JaxShim()
    ref_metrics.torch = types.SimpleNamespace(
        cuda=types.SimpleNamespace(is_available=lambda: True)
    )

    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(0, 1, (20, 26, 3)).astype(np.float32))
    b = jnp.asarray(
        np.clip(
            np.asarray(a) + rng.normal(0, 0.08, (20, 26, 3)), 0, 1
        ).astype(np.float32)
    )
    m = jnp.asarray((rng.uniform(size=(20, 26, 1)) > 0.3).astype(np.float32))

    ref_psnr = float(ref_metrics.compute_psnr(a, b, m))
    ref_ssim = float(ref_metrics.compute_ssim(a, b, m))
    np.testing.assert_allclose(float(dm.compute_psnr(a, b, m)), ref_psnr,
                               rtol=1e-5)
    np.testing.assert_allclose(float(dm.compute_ssim(a, b, m)), ref_ssim,
                               rtol=1e-4)


def test_bundled_lin_heads_match_reference():
    """The repo-bundled linear heads must be byte-identical to the
    reference's nsff_lpips/weights/v0.1/alex.pth (trainer_pgdvs.py:130-137
    loads exactly these for the NVIDIA protocol)."""
    import pathlib

    bundled = (
        pathlib.Path(__file__).parent.parent
        / "pgdvs_tpu" / "metrics" / "weights" / "lpips_lin_alex_v0.1.pth"
    )
    ref = pathlib.Path(REF) / "pgdvs/utils/nsff_lpips/weights/v0.1/alex.pth"
    assert bundled.is_file()
    if ref.is_file():
        assert bundled.read_bytes() == ref.read_bytes()

    # and the loader must pick them up with no env setup when a backbone is
    # resolvable; with no backbone anywhere it degrades to None, not a crash
    import torch

    from pgdvs_tpu.metrics.lpips_jax import load_torch_weights

    lin_sd = torch.load(bundled, map_location="cpu", weights_only=True)
    assert {f"lin{k}.model.1.weight" for k in range(5)} == set(lin_sd)

    params = load_torch_weights()
    if params is not None:  # backbone found in this environment
        assert all(f"lin{k}" in params for k in range(5))
