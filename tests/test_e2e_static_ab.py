"""End-to-end static-branch A/B vs the REFERENCE renderer.

Runs the reference's whole static GNT branch — ``BaseRenderer.forward``
(chunked ``render_rays``, ``gnt/renderer.py:30-412``) with the real
``Projector.compute`` (``gnt/projector.py:117-308``) and the reference's own
``get_batched_rays`` ray generation (``pgdvs_renderer_base.py:17-75``) — on a
tiny random-weight scene, against this framework's ``render_image_gnt``.

Module-level parity (network / feature net / sampler, test_torch_parity.py)
does NOT cover ray generation, the projector's mixed align_corners
conventions (``projector.py:252,258``), depth-range handling, or mask
semantics; this test closes exactly that gap, for:
  * the exact epipolar mode (must agree at f32 tolerance),
  * dyn-mask on and off,
  * scene-wide AND per-ray depth ranges,
  * the fine importance-resampling pass,
and additionally QUANTIFIES the quad-mode sampling deviation (bounded, not
bit-equal: quad maps pre-upsample features, double-interpolating them).
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"


def _stub_module(name):
    """A sys.modules stub with a real ModuleSpec: importlib.util.find_spec
    raises ValueError on spec-less modules, which breaks later imports that
    probe optional deps (e.g. transformers checking torchvision)."""
    import importlib.machinery
    import types as _types

    mod = _types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod

H, W, V = 40, 48, 3
SAMPLES = 24


def _stub_missing_deps():
    """The reference imports hydra/cv2/cupy/vis deps at module scope; none
    are needed for the code paths this test drives — stub them (including
    the reference's own heavy util modules, whose single used symbols are
    provided as no-ops)."""
    for name in ("hydra", "hydra.utils", "cupy",
                 "pgdvs.utils.vis_utils", "pgdvs.utils.training"):
        if name not in sys.modules:
            sys.modules[name] = _stub_module(name)
    hydra = sys.modules["hydra"]
    hydra.utils = sys.modules["hydra.utils"]
    hydra.utils.instantiate = lambda *a, **k: None
    # cupy.memoize decorates module-level functions in the vendored
    # softsplat (CUDA-only code this test never executes)
    sys.modules["cupy"].memoize = lambda **k: (lambda f: f)
    # einops probes sys.modules for frameworks: without a real
    # ndarray type it registers a broken cupy backend
    sys.modules["cupy"].ndarray = type("ndarray", (), {})
    sys.modules["pgdvs.utils.vis_utils"].draw_cam_mesh = lambda *a, **k: None
    sys.modules["pgdvs.utils.training"].disabled_train = lambda self, *a: self


def _import_reference():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub_missing_deps()
    try:
        from pgdvs.models.gnt.models.feature_network import ResUNet as TorchResUNet
        from pgdvs.models.gnt.models.transformer_network import GNT as TorchGNT
        from pgdvs.models.gnt.renderer import BaseRenderer
        from pgdvs.renderers.pgdvs_renderer_base import PGDVSBaseRenderer
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference modules unavailable: {e}")
    return torch, TorchResUNet, TorchGNT, BaseRenderer, PGDVSBaseRenderer


def _scene(rng):
    """Tiny scene: V offset cameras looking down +z, smooth random images."""
    k4 = np.eye(4, dtype=np.float32)
    k4[0, 0] = k4[1, 1] = 40.0
    k4[0, 2], k4[1, 2] = W / 2.0, H / 2.0

    def c2w(dx, dy):
        m = np.eye(4, dtype=np.float32)
        m[0, 3], m[1, 3] = dx, dy
        return m

    tgt_c2w = c2w(0.05, -0.03)
    src_c2ws = np.stack([c2w(-0.3, 0.0), c2w(0.3, 0.1), c2w(0.0, -0.25)])

    # smooth images: random low-res upsampled (keeps bilinear sampling
    # differences visible but finite-precision friendly)
    lo = rng.uniform(0, 1, (V, H // 4, W // 4, 3)).astype(np.float32)
    src_rgbs = np.stack(
        [
            np.asarray(
                jax.image.resize(jnp.asarray(im), (H, W, 3), "linear")
            )
            for im in lo
        ]
    )
    masks = (rng.uniform(size=(V, H, W, 1)) > 0.8).astype(np.float32)
    depth_range = np.asarray([1.5, 6.0], np.float32)
    return k4, tgt_c2w, src_c2ws, src_rgbs, masks, depth_range


def _flat_cam(k4, c2w):
    return np.concatenate(
        [np.asarray([H, W], np.float32), k4.reshape(-1), c2w.reshape(-1)]
    )


def _run_reference(
    torch,
    TorchResUNet,
    TorchGNT,
    BaseRenderer,
    PGDVSBaseRenderer,
    scene,
    use_dyn_mask,
    per_ray_depth,
    n_fine,
):
    from pgdvs.models.gnt.projector import Projector

    k4, tgt_c2w, src_c2ws, src_rgbs, masks, depth_range = scene
    torch.manual_seed(0)
    tres = TorchResUNet(coarse_out_ch=32, single_net=True)
    tgnt = TorchGNT(netwidth=64, transformer_depth=8, in_feat_ch=32,
                    ret_alpha=True)
    tres.eval()
    tgnt.eval()

    shim = object.__new__(BaseRenderer)
    torch.nn.Module.__init__(shim)
    shim.projector = Projector()
    shim.model = types.SimpleNamespace(
        feature_net=tres, net_coarse=tgnt, net_fine=None, single_net=True
    )

    rayger = object.__new__(PGDVSBaseRenderer)
    ray_o, ray_d, uvs, batch_refs, (rh, rw) = PGDVSBaseRenderer.get_batched_rays(
        rayger,
        device="cpu",
        batch_size=1,
        H=H,
        W=W,
        render_stride=1,
        intrinsics=torch.tensor(k4[None]),
        c2w=torch.tensor(tgt_c2w[None]),
    )

    if per_ray_depth:
        dr = np.broadcast_to(depth_range, (H * W, 2)).copy()
        # mild per-ray variation exercises the per-ray branch
        dr[:, 0] += np.linspace(0, 0.3, H * W, dtype=np.float32)
        dr_t = torch.tensor(dr)
        per_ray_flag = True
    else:
        dr_t = torch.tensor(depth_range[None])
        per_ray_flag = False

    ray_batch = {
        "ray_o": ray_o,
        "ray_d": ray_d,
        "camera": torch.tensor(_flat_cam(k4, tgt_c2w)[None]),
        "rgb": None,
        "batch_refs": batch_refs,
        "view_uv": uvs,
        "raw_h": H,
        "raw_w": W,
        "render_h": rh,
        "render_w": rw,
        "depth_range": dr_t,
        "depth_range_per_ray": per_ray_flag,
        "src_rgbs": torch.tensor(src_rgbs[None]),
        "src_invalid_masks": torch.tensor(masks[None]),
        "src_cameras": torch.tensor(
            np.stack([_flat_cam(k4, c) for c in src_c2ws])[None]
        ),
    }

    with torch.no_grad():
        ret = BaseRenderer.forward(
            shim,
            ray_batch=ray_batch,
            chunk_size=700,  # multiple uneven chunks
            inv_uniform=True,
            n_coarse_samples_per_ray=SAMPLES,
            n_fine_samples_per_ray=n_fine,
            flag_deterministic=True,
            use_dyn_mask=use_dyn_mask,
            render_stride=1,
            disable_tqdm=True,
        )
    outs = ret["outputs_fine"] if n_fine > 0 else ret["outputs_coarse"]
    return (
        {k: v[0].numpy() for k, v in outs.items()},
        {k: v.detach().numpy() for k, v in tres.state_dict().items()},
        {k: v.detach().numpy() for k, v in tgnt.state_dict().items()},
    )


def _run_ours(scene, tres_sd, tgnt_sd, use_dyn_mask, per_ray_depth, n_fine,
              epipolar_mode):
    from pgdvs_tpu.models.gnt.weight_port import port_feature_net, port_gnt
    from pgdvs_tpu.renderers.config import RenderConfig
    from pgdvs_tpu.renderers.static_gnt import make_gnt_models, render_image_gnt

    k4, tgt_c2w, src_c2ws, src_rgbs, masks, depth_range = scene
    models = make_gnt_models(dtype="float32", ret_view_std=False)
    params = {
        "feature_net": {"params": port_feature_net(tres_sd)},
        "gnt": {"params": port_gnt(tgnt_sd, depth=8)},
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    cfg = RenderConfig(
        n_coarse_samples_per_ray=SAMPLES,
        n_fine_samples_per_ray=n_fine,
        sample_inv_uniform=True,
        ray_tile=512,  # several uneven tiles
        use_pallas_gnt=False,
        epipolar_mode=epipolar_mode,
        gnt_use_dyn_mask=use_dyn_mask,
    )
    if per_ray_depth:
        dr = np.broadcast_to(depth_range, (H * W, 2)).copy()
        dr[:, 0] += np.linspace(0, 0.3, H * W, dtype=np.float32)
        dr_j = jnp.asarray(dr.reshape(H, W, 2))
    else:
        dr_j = jnp.asarray(depth_range)
    out = render_image_gnt(
        models,
        params,
        jnp.asarray(_flat_cam(k4, tgt_c2w)),
        jnp.asarray(np.stack([_flat_cam(k4, c) for c in src_c2ws])),
        jnp.asarray(src_rgbs),
        (H, W),
        dr_j,
        cfg,
        src_invalid_masks=jnp.asarray(masks) if use_dyn_mask else None,
    )
    return {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.slow
@pytest.mark.parametrize(
    "use_dyn_mask,per_ray_depth,n_fine",
    [
        (False, False, 0),
        (True, False, 0),
        (False, True, 0),
        (True, False, 8),
    ],
)
def test_static_branch_exact_ab(use_dyn_mask, per_ray_depth, n_fine):
    ref_bits = _import_reference()
    rng = np.random.default_rng(5)
    scene = _scene(rng)
    ref, tres_sd, tgnt_sd = _run_reference(
        *ref_bits, scene, use_dyn_mask, per_ray_depth, n_fine
    )
    got = _run_ours(
        scene, tres_sd, tgnt_sd, use_dyn_mask, per_ray_depth, n_fine, "exact"
    )

    np.testing.assert_allclose(
        got["rgb"], ref["rgb"].reshape(H, W, 3), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        got["depth"], ref["depth"].reshape(H, W), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        got["inbound_cnt"], ref["inbound_cnt"].reshape(H, W), atol=1e-3
    )
    np.testing.assert_allclose(
        got["dyn_cnt"], ref["dyn_cnt"].reshape(H, W), atol=1e-3
    )


@pytest.mark.slow
@pytest.mark.parametrize(
    "with_dyn_mask,stride,per_ray_depth",
    [(False, 1, False), (True, 1, True), (False, 2, True)],
)
def test_top_renderer_pure_gnt_ab(with_dyn_mask, stride, per_ray_depth):
    """A/B the TOP-LEVEL renderer glue: reference ``PGDVSRenderer.forward``
    in pure-GNT mode (``pgdvs_renderer.py:83-135`` + ``prepare_ray_batch``
    :354-420 + ``forward_st_gnt``) vs ``render_novel_view``. Covers the
    contract unpacking the static-branch A/B drives manually: masked-vs-raw
    spatial source selection, per-ray depth-range striding under
    render_stride, and the pure_gnt short-circuits."""
    torch, TorchResUNet, TorchGNT, BaseRenderer, PGDVSBaseRenderer = (
        _import_reference()
    )
    for name in ("pytorch3d", "pytorch3d.utils", "pytorch3d.ops",
                 "trimesh", "torchvision", "torchvision.utils", "omegaconf",
                 "pgdvs.models.tapnet.interface",
                 "pgdvs.models.cotracker.interface"):
        if name not in sys.modules:
            sys.modules[name] = _stub_module(name)
    if not hasattr(sys.modules["omegaconf"], "DictConfig"):
        sys.modules["omegaconf"].DictConfig = dict
    sys.modules["pytorch3d"].utils = sys.modules["pytorch3d.utils"]
    sys.modules["pytorch3d"].ops = sys.modules["pytorch3d.ops"]
    sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]
    sys.modules["pgdvs.models.tapnet.interface"].TAPNetInterface = None
    sys.modules["pgdvs.models.cotracker.interface"].CoTrackerInterface = None
    import pathlib

    orig_mkdir = pathlib.Path.mkdir
    pathlib.Path.mkdir = lambda self, *a, **k: None
    try:
        from pgdvs.renderers.pgdvs_renderer import PGDVSRenderer
        from pgdvs.models.gnt.projector import Projector
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference top renderer unavailable: {e}")
    finally:
        pathlib.Path.mkdir = orig_mkdir

    rng = np.random.default_rng(5)
    scene = _scene(rng)
    k4, tgt_c2w, src_c2ws, src_rgbs, masks, depth_range = scene

    torch.manual_seed(0)
    tres = TorchResUNet(coarse_out_ch=32, single_net=True).eval()
    tgnt = TorchGNT(netwidth=64, transformer_depth=8, in_feat_ch=32,
                    ret_alpha=True).eval()
    st_shim = object.__new__(BaseRenderer)
    torch.nn.Module.__init__(st_shim)
    st_shim.projector = Projector()
    st_shim.model = types.SimpleNamespace(
        feature_net=tres, net_coarse=tgnt, net_fine=None, single_net=True
    )

    top = object.__new__(PGDVSRenderer)
    torch.nn.Module.__init__(top)
    top.static_renderer = st_shim
    top.dyn_renderer = None  # unused on the pure_gnt path

    if per_ray_depth:
        dr = np.broadcast_to(depth_range, (H, W, 2)).copy()
        dr[..., 0] += np.linspace(0, 0.3, H * W, dtype=np.float32).reshape(H, W)
        dr_t = torch.tensor(dr[None])
        dr_j = jnp.asarray(dr)
    else:
        dr_t = torch.tensor(depth_range[None])
        dr_j = jnp.asarray(depth_range)

    data_t = {
        "rgb_src_temporal": torch.zeros((1, 2, H, W, 3)),
        "flat_cam_tgt": torch.tensor(_flat_cam(k4, tgt_c2w)[None]),
        "rgb_src_spatial": torch.tensor(src_rgbs[None]),
        "static_rgb_src_spatial": torch.tensor(
            (src_rgbs * (1 - masks))[None]
        ),
        "dyn_mask_src_spatial": torch.tensor(masks[None]),
        "flat_cam_src_spatial": torch.tensor(
            np.stack([_flat_cam(k4, c) for c in src_c2ws])[None]
        ),
        "depth_range": dr_t,
    }
    render_cfg = types.SimpleNamespace(
        render_stride=stride,
        chunk_size=700,
        sample_inv_uniform=True,
        n_coarse_samples_per_ray=SAMPLES,
        n_fine_samples_per_ray=0,
        gnt_use_dyn_mask=with_dyn_mask,
        # the reference asserts pure_gnt modes use UNMASKED spatial sources
        gnt_use_masked_spatial_src=False,
        pure_gnt=not with_dyn_mask,
        pure_gnt_with_dyn_mask=with_dyn_mask,
        mask_oob_n_proj_thres=1,
        mask_invalid_n_proj_thres=4,
    )
    with torch.no_grad():
        ref = PGDVSRenderer.forward(
            top, data_t, render_cfg=render_cfg, disable_tqdm=True
        )
    ref_rgb = ref["combined_rgb"][0].permute(1, 2, 0).numpy()

    from pgdvs_tpu.models.gnt.weight_port import port_feature_net, port_gnt
    from pgdvs_tpu.renderers.compose import render_novel_view
    from pgdvs_tpu.renderers.config import RenderConfig
    from pgdvs_tpu.renderers.static_gnt import make_gnt_models

    models = make_gnt_models(dtype="float32", ret_view_std=False)
    params = jax.tree_util.tree_map(
        jnp.asarray,
        {
            "feature_net": {
                "params": port_feature_net(
                    {k: v.detach().numpy() for k, v in tres.state_dict().items()}
                )
            },
            "gnt": {
                "params": port_gnt(
                    {k: v.detach().numpy() for k, v in tgnt.state_dict().items()},
                    depth=8,
                )
            },
        },
    )
    cfg = RenderConfig(
        n_coarse_samples_per_ray=SAMPLES,
        sample_inv_uniform=True,
        ray_tile=512,
        use_pallas_gnt=False,
        epipolar_mode="exact",
        render_stride=stride,
        gnt_use_dyn_mask=with_dyn_mask,
        gnt_use_masked_spatial_src=False,
        pure_gnt=not with_dyn_mask,
        pure_gnt_with_dyn_mask=with_dyn_mask,
    )
    data_j = {
        "rgb_src_temporal": jnp.zeros((2, H, W, 3)),
        "flat_cam_tgt": jnp.asarray(_flat_cam(k4, tgt_c2w)),
        "rgb_src_spatial": jnp.asarray(src_rgbs),
        "static_rgb_src_spatial": jnp.asarray(src_rgbs * (1 - masks)),
        "dyn_mask_src_spatial": jnp.asarray(masks),
        "flat_cam_src_spatial": jnp.asarray(
            np.stack([_flat_cam(k4, c) for c in src_c2ws])
        ),
        "depth_range": dr_j,
    }
    out = render_novel_view(
        models, params, data_j, cfg, jax.random.PRNGKey(0), static_mode="gnt"
    )
    got = np.asarray(out["combined_rgb"])

    assert got.shape == ref_rgb.shape
    np.testing.assert_allclose(got, ref_rgb, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_static_branch_quad_deviation_bounded():
    """Quad-map sampling is an approximation (features pre-upsampled then
    re-interpolated); quantify its deviation from the reference end to end."""
    ref_bits = _import_reference()
    rng = np.random.default_rng(5)
    scene = _scene(rng)
    ref, tres_sd, tgnt_sd = _run_reference(*ref_bits, scene, False, False, 0)
    got = _run_ours(scene, tres_sd, tgnt_sd, False, False, 0, "quad")

    rgb_ref = ref["rgb"].reshape(H, W, 3)
    err = np.abs(got["rgb"] - rgb_ref)
    # quad mode runs the net in bf16 maps by default only when the model is
    # bf16; here the model is f32 so the deviation isolates the sampling
    assert err.mean() < 5e-3, err.mean()
    assert err.max() < 0.08, err.max()
    psnr = -10 * np.log10(np.mean((got["rgb"] - rgb_ref) ** 2) + 1e-12)
    assert psnr > 35.0, psnr
