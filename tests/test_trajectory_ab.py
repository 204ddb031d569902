"""Trajectory-math A/B vs the reference geometry utilities.

Drives the reference's pure-numpy pose interpolation stack
(``/root/reference/pgdvs/utils/geometry.py``: quaternion class, slerp,
``linear_pose_interp``, qvec<->rotmat) and the bullet-time pose generator
(``/root/reference/pgdvs/datasets/nvidia_vis.py:692-722``) against this
framework's implementations. These feed every visualization trajectory
(nvidia_vis / mono_vis / dycheck vis), where a quaternion-convention slip
would bend whole camera paths yet pass the existing formula-level tests.
"""

import sys

import numpy as np
import pytest

REF = "/root/reference"


def _import_reference_geometry():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # the reference quaternion class uses np.mat, removed in NumPy 2.0 —
    # restore it as the (equivalent) asmatrix alias for the A/B
    if not hasattr(np, "mat"):
        np.mat = np.asmatrix
    try:
        from pgdvs.utils import geometry as ref_geo
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference geometry unavailable: {e}")
    return ref_geo


def _random_rot(rng):
    from scipy.spatial.transform import Rotation

    return Rotation.from_quat(rng.normal(size=4)).as_matrix()


@pytest.mark.parametrize("t", [0.0, 0.2, 0.5, 0.77, 1.0])
def test_linear_pose_interp_matches_reference(t):
    ref_geo = _import_reference_geometry()
    from pgdvs_tpu.core.geometry import linear_pose_interp

    rng = np.random.default_rng(5)
    for _ in range(8):
        ra, rb = _random_rot(rng), _random_rot(rng)
        ta, tb = rng.normal(size=3), rng.normal(size=3)

        ref_rot, ref_trans = ref_geo.linear_pose_interp(ta, ra, tb, rb, t)
        our_rot, our_trans = linear_pose_interp(ta, ra, tb, rb, t)

        np.testing.assert_allclose(our_rot, ref_rot, atol=1e-6)
        np.testing.assert_allclose(our_trans, ref_trans, atol=1e-8)


def test_qvec_rotmat_roundtrip_matches_reference():
    ref_geo = _import_reference_geometry()
    from pgdvs_tpu.core.geometry import qvec_to_rotmat, rotmat_to_qvec

    rng = np.random.default_rng(9)
    for _ in range(16):
        r = _random_rot(rng)
        q_ref = ref_geo.rotmat2qvec(r)
        q_ours = rotmat_to_qvec(r)
        # qvec is sign-ambiguous; compare up to sign
        if np.dot(q_ref, q_ours) < 0:
            q_ours = -q_ours
        np.testing.assert_allclose(q_ours, q_ref, atol=1e-6)
        np.testing.assert_allclose(
            qvec_to_rotmat(q_ref), ref_geo.qvec2rotmat(q_ref), atol=1e-7
        )


def test_create_bt_poses_matches_reference():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        import importlib

        spec = importlib.util.spec_from_file_location(
            "_ref_bt_only", REF + "/pgdvs/datasets/nvidia_vis.py"
        )
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference nvidia_vis unavailable: {e}")
    # nvidia_vis imports the dataset stack at module level; create_bt_poses
    # itself is numpy-only — execute just its source
    import ast
    import textwrap

    src = open(REF + "/pgdvs/datasets/nvidia_vis.py").read()
    tree = ast.parse(src)
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "create_bt_poses"
    )
    ns = {"np": np}
    exec(  # noqa: S102 - executing the reference's own function source
        compile(ast.Module(body=[fn], type_ignores=[]), "<ref>", "exec"), ns
    )
    ref_create_bt_poses = ns["create_bt_poses"]

    from pgdvs_tpu.data.nvidia_vis import create_bt_poses

    for focal, n, sc, max_disp in [
        (240.0, 8, None, 32.0),
        (500.0, 12, 2.5, 48.0),
    ]:
        ref = np.stack(
            ref_create_bt_poses(focal, num_frames=n, sc=sc, max_disp=max_disp)
        )
        ours = np.stack(
            create_bt_poses(focal, num_frames=n, sc=sc, max_disp=max_disp)
        )
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-10)
