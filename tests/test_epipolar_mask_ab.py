"""Epipolar motion-mask A/B vs the reference ``compute_mask_epipolar_flow``
(``/root/reference/pgdvs/preprocess/compute_mask.py:160-340``).

The reference module imports the full detectron2/OneFormer stack at module
scope, so the numpy-only functions under test (``skew``,
``compute_epipolar_distance``, ``read_optical_flow``,
``compute_mask_epipolar_flow``) are AST-extracted and executed with a
scipy-backed ``skimage.morphology`` shim (same border semantics:
erosion pads True, dilation pads False — validated by
tests/test_combine_masks.py). Covers the Sampson-style epipolar distance,
the closer-camera flow selection, consistency gating, and the
first/middle/last-frame branches.
"""

import ast
import pathlib
import types

import numpy as np
import pytest

REF_FILE = "/root/reference/pgdvs/preprocess/compute_mask.py"

H, W = 30, 38


def _extract_reference_fns():
    try:
        src = open(REF_FILE).read()
    except OSError as e:
        pytest.skip(f"reference compute_mask unavailable: {e}")
    tree = ast.parse(src)
    wanted = {
        "skew", "compute_epipolar_distance", "read_optical_flow",
        "compute_mask_epipolar_flow",
    }
    nodes = [
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name in wanted
    ]
    assert {n.name for n in nodes} == wanted

    from pgdvs_tpu.preprocess.combine_masks import (
        binary_dilation_disk,
        binary_erosion_disk,
        disk_footprint,
    )

    morphology = types.SimpleNamespace(
        disk=disk_footprint,
        binary_opening=lambda m, footprint: binary_dilation_disk(
            binary_erosion_disk(m, 1), 1
        ),
    )
    ns = {"np": np, "skimage": types.SimpleNamespace(morphology=morphology)}
    exec(  # noqa: S102 - executing the reference's own function sources
        compile(ast.Module(body=nodes, type_ignores=[]), "<ref>", "exec"), ns
    )
    return ns


def _scene(tmp_path):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    n = 4
    all_k = np.stack([np.diag([45.0, 45.0, 1.0]) for _ in range(n)])
    all_k[:, 0, 2] = W / 2.0
    all_k[:, 1, 2] = H / 2.0

    all_w2c = []
    for i in range(n):
        m = np.eye(4)
        ang = 0.02 * i
        m[0, 0] = m[2, 2] = np.cos(ang)
        m[0, 2] = np.sin(ang)
        m[2, 0] = -np.sin(ang)
        m[:3, 3] = [0.05 * i + 0.013 * rng.uniform(), -0.03 * i, 0.01 * i]
        all_w2c.append(m)
    all_w2c = np.stack(all_w2c)

    def smooth(lo, hi, ch):
        small = rng.uniform(lo, hi, (H // 3, W // 3, ch))
        return np.asarray(
            jax.image.resize(jnp.asarray(small, jnp.float32), (H, W, ch),
                             "linear")
        )

    names = [f"{i:05d}" for i in range(n)]
    flow_dir = tmp_path / "flows"
    flow_dir.mkdir()
    flows = {}
    for i in range(n):
        for j in (i - 1, i + 1):
            if 0 <= j < n:
                flows[(i, j)] = (
                    smooth(-3, 3, 2),
                    smooth(-1.5, 1.5, 2),  # coord_diff
                )
                np.savez(
                    flow_dir / f"{names[i]}_{names[j]}.npz",
                    flow=flows[(i, j)][0],
                    coord_diff=flows[(i, j)][1],
                )
    return all_k, all_w2c, names, flow_dir, flows


@pytest.mark.parametrize("idx_ref", [0, 1, 2, 3])
def test_epipolar_mask_matches_reference(idx_ref, tmp_path):
    ns = _extract_reference_fns()
    all_k, all_w2c, names, flow_dir, flows = _scene(tmp_path)
    n = len(names)

    img_ref = np.zeros((H, W, 3), np.float32)
    ref_mask = ns["compute_mask_epipolar_flow"](
        img_ref=img_ref,
        idx_ref=idx_ref,
        n_all_frames=n,
        all_w2c=all_w2c,
        all_K=all_k,
        flow_dir=pathlib.Path(flow_dir),
        flow_interval=1,
        threshold=0.35,
        all_img_names=names,
    )

    from pgdvs_tpu.preprocess.epipolar_mask import epipolar_motion_mask

    consist = lambda cd: np.sum(np.abs(cd), axis=2) <= 1.0
    fwd = flows.get((idx_ref, idx_ref + 1))
    bwd = flows.get((idx_ref, idx_ref - 1))
    our_mask = epipolar_motion_mask(
        flow_fwd=None if fwd is None else fwd[0],
        flow_bwd=None if bwd is None else bwd[0],
        consist_fwd=None if fwd is None else consist(fwd[1]),
        consist_bwd=None if bwd is None else consist(bwd[1]),
        w2c_ref=all_w2c[idx_ref],
        k_ref=all_k[idx_ref],
        w2c_prev=None if bwd is None else all_w2c[idx_ref - 1],
        k_prev=None if bwd is None else all_k[idx_ref - 1],
        w2c_post=None if fwd is None else all_w2c[idx_ref + 1],
        k_post=None if fwd is None else all_k[idx_ref + 1],
        threshold=0.35,
    )

    assert ref_mask.mean() > 0.01, "test scene produced an empty motion mask"
    np.testing.assert_array_equal(np.asarray(our_mask), np.asarray(ref_mask))
