"""NVIDIA visualization dataset — space-time interpolation trajectories.

Equivalent of ``/root/reference/pgdvs/datasets/nvidia_vis.py``: novel views
along a trajectory that slerp+lerp interpolates consecutive training poses
at fractional time, composed with "bullet-time" circular camera offsets
(NSFF-style, translation amplitude max_disp / focal, repeated N_BT_REPS
times per sweep). Emits the same contract as the eval dataset but without
rgb_tgt / eval_mask (no ground truth at virtual views) and with fractional
``time_tgt`` driving the dynamic point-cloud interpolation.
"""

from __future__ import annotations

import numpy as np

from pgdvs_tpu.core.geometry import linear_pose_interp
from pgdvs_tpu.data.llff import hwf_to_intrinsics4
from pgdvs_tpu.data.nvidia_eval import N_CAMS, NvidiaEvalDataset

N_BT_REPS = 8


def create_bt_poses(focal, num_frames: int, max_disp: float = 32.0, sc=None):
    """Bullet-time circular offset poses (NSFF's render path).

    Returns a list of 4x4 c2w offsets with translation amplitude
    ``max_disp / focal`` (max_disp further divided by the scene scale sc).
    """
    if sc is not None:
        max_disp = max_disp / sc
    max_trans = max_disp / float(focal)
    out = []
    for i in range(num_frames):
        x = max_trans * np.sin(2.0 * np.pi * i / num_frames)
        y = max_trans * np.cos(2.0 * np.pi * i / num_frames) / 2.0
        pose = np.eye(4)
        pose[:3, 3] = [x, y, 0.0]
        out.append(np.linalg.inv(pose))
    return out


class NvidiaVisDataset(NvidiaEvalDataset):
    def __init__(
        self,
        *args,
        n_render_frames: int = 200,
        vis_center_time: int = 50,
        vis_time_interval: int = 10,
        vis_bt_max_disp: float = 64.0,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.n_render_frames = n_render_frames
        self.vis_center_time = vis_center_time
        self.vis_time_interval = vis_time_interval
        self.vis_bt_max_disp = vis_bt_max_disp

        # one trajectory entry per rendered frame, across scenes
        scenes = sorted({s for s, *_ in self.items})
        self.traj = []
        for scene in scenes:
            all_hwf, all_c2w, bds = self._cams(scene)
            n = all_hwf.shape[0]
            times = np.linspace(
                max(0, vis_center_time - vis_time_interval),
                min(n - 2, vis_center_time + vis_time_interval),
                n_render_frames,
            )
            # bullet-time amplitude is normalized by the scene's near-bound
            # scale, like NSFF's bd_factor rescale (nvidia_vis.py:207-217 —
            # FLAG_RESCALE_POSES is False so the scale moves into the
            # translation amplitude instead of the poses)
            bt_disp_sc = 1.0 / (np.percentile(bds[:, 0], 5) * 0.9)
            bt = create_bt_poses(
                all_hwf[0, 2],
                num_frames=max(1, n_render_frames // N_BT_REPS),
                max_disp=vis_bt_max_disp,
                sc=bt_disp_sc,
            )
            bt = bt * (N_BT_REPS + 1)
            for i, t in enumerate(times):
                it = int(np.floor(t))
                ratio = float(t - np.floor(t))
                rot, trans = linear_pose_interp(
                    all_c2w[it, :3, 3],
                    all_c2w[it, :3, :3],
                    all_c2w[it + 1, :3, 3],
                    all_c2w[it + 1, :3, :3],
                    ratio,
                )
                c2w = np.eye(4)
                c2w[:3, :3] = rot
                c2w[:3, 3] = trans
                c2w = c2w @ bt[i]
                self.traj.append((scene, float(t), i, c2w))

    def __len__(self):
        return len(self.traj)

    def __getitem__(self, index):
        scene, tgt_time, frame_i, tgt_c2w = self.traj[index]
        all_hwf, all_c2w, _ = self._cams(scene)
        n_frames = all_hwf.shape[0]

        temporal = sorted(
            {
                f
                for f in (
                    int(np.floor(tgt_time)) if tgt_time > 0 else None,
                    int(np.floor(tgt_time)) + 1 if tgt_time < n_frames - 1 else None,
                )
                if f is not None
            }
        )
        n_actual_temporal = len(temporal)
        if n_actual_temporal == 1:
            temporal.append(temporal[0])

        pool = list(
            range(
                max(0, temporal[0] - N_CAMS), min(n_frames, temporal[1] + N_CAMS)
            )
        )
        from pgdvs_tpu.core.geometry import sort_poses_wrt_ref

        order = sort_poses_wrt_ref(tgt_c2w, all_c2w[pool], metric="dist")
        spatial = sorted([pool[i] for i in np.asarray(order)[: self.n_spatial]])

        # working resolution from the first temporal source frame
        import PIL.Image

        raw = np.array(PIL.Image.open(self._mono_img_path(scene, temporal[0])))
        h, w = raw.shape[0], raw.shape[1]

        sp_rgb, sp_mask, sp_depth, sp_cam = self._frame_bundle(
            scene, spatial, all_c2w, all_hwf, h, w
        )
        tp_rgb, tp_mask, tp_depth, tp_cam = self._frame_bundle(
            scene, temporal, all_c2w, all_hwf, h, w
        )

        from pgdvs_tpu.core.geometry import unproject_depth

        pts = []
        for i in range(len(spatial)):
            k4 = sp_cam[i][2:18].reshape(4, 4)
            c2w = sp_cam[i][18:34].reshape(4, 4)
            pts.append(
                np.asarray(unproject_depth(sp_depth[i][..., 0], k4, c2w)).reshape(-1, 3)
            )
        pts = np.concatenate(pts)
        pts_h = np.concatenate([pts, np.ones_like(pts[:, :1])], axis=1)
        cam_pts = (np.linalg.inv(tgt_c2w) @ pts_h.T).T
        depth_range = np.array(
            [
                max(1e-16, 0.8 * float(np.min(cam_pts[:, 2]))),
                max(2e-16, 1.2 * float(np.quantile(cam_pts[:, 2], 0.9))),
            ],
            np.float32,
        )

        flow_fwd, flow_fwd_occ = self._read_flow(scene, temporal[0], temporal[1], h, w)
        flow_bwd, flow_bwd_occ = self._read_flow(scene, temporal[1], temporal[0], h, w)

        # the reference builds the virtual camera's K from frame 0's hwf
        # (nvidia_vis.py:469-471)
        k_tgt = hwf_to_intrinsics4(all_hwf[0], tgt_shape=(h, w))
        flat_cam_tgt = np.concatenate(
            [[h, w], k_tgt.ravel(), tgt_c2w.ravel()]
        ).astype(np.float32)

        return {
            "seq_ids": np.array([frame_i, *spatial, *temporal], np.int64),
            "rgb_src_spatial": sp_rgb,
            "dyn_rgb_src_spatial": sp_rgb * sp_mask,
            "static_rgb_src_spatial": sp_rgb * (1 - sp_mask),
            "rgb_src_temporal": tp_rgb,
            "dyn_rgb_src_temporal": tp_rgb * tp_mask,
            "static_rgb_src_temporal": tp_rgb * (1 - tp_mask),
            "dyn_mask_src_spatial": sp_mask,
            "dyn_mask_src_temporal": tp_mask,
            "flow_fwd": flow_fwd,
            "flow_fwd_occ_mask": flow_fwd_occ,
            "flow_bwd": flow_bwd,
            "flow_bwd_occ_mask": flow_bwd_occ,
            "flat_cam_tgt": flat_cam_tgt,
            "flat_cam_src_spatial": sp_cam,
            "flat_cam_src_temporal": tp_cam,
            "depth_src_spatial": sp_depth,
            "depth_src_temporal": tp_depth,
            "depth_range": depth_range,
            "time_tgt": np.array([tgt_time], np.float32),
            "time_src_temporal": np.array(temporal, np.float32),
            "misc": {
                "scene_id": scene,
                "vis_frame_i": frame_i,
                "tgt_time": tgt_time,
                "n_actual_temporal": n_actual_temporal,
            },
            # track windows reuse the eval-layout helper; note the
            # reference's vis reader ALSO includes temporal[1] itself as the
            # first bwd track frame (a K+1-slot quirk, nvidia_vis.py:
            # 399-410) — outcome-neutral for the track renderer, since
            # points visible there are excluded upstream, so the canonical
            # K-slot layout is kept
            **(
                self._track_sources(
                    scene, temporal, tgt_time, n_frames, all_c2w, all_hwf, h, w
                )
                if self.with_track_sources
                else {}
            ),
        }
