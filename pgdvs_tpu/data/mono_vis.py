"""In-the-wild monocular visualization dataset (DAVIS-style layout).

Equivalent of ``/root/reference/pgdvs/datasets/mono_vis.py``: reads the
preprocessing pipeline's output layout

  <root>/<scene>/rgbs/<name>.png
  <root>/<scene>/poses/<name>.npz           {K [4,4], c2w [4,4]}
  <root>/<scene>/depths/<name>.npz          {depth [H,W]}
  <root>/<scene>/masks/final/<name>_final.png
  <root>/<scene>/flows/interval_<k>/<a>_<b>.npz  {flow, coord_diff}

and renders the same slerp+bullet-time trajectory as the NVIDIA vis dataset.
Depth-percentile bounds set the bullet-time translation scale
(``mono_vis.py:127-147``: 5th-percentile near depth x 0.9 as 1/scale).
"""

from __future__ import annotations

import pathlib

import numpy as np
import PIL.Image

from pgdvs_tpu.core.geometry import linear_pose_interp, unproject_depth
from pgdvs_tpu.data.nvidia_vis import N_BT_REPS, create_bt_poses


class MonoVisDataset:
    def __init__(
        self,
        data_root,
        scene_ids,
        n_render_frames: int = 200,
        vis_center_time: int = 50,
        vis_time_interval: int = 10,
        vis_bt_max_disp: float = 64.0,
        n_src_views_spatial: int = 10,
        flow_consist_thres: float = 1.0,
        n_src_views_temporal_track_one_side: int = 5,
        with_track_sources: bool = False,
    ):
        self.root = pathlib.Path(data_root)
        self.n_spatial = n_src_views_spatial
        self.flow_consist_thres = flow_consist_thres
        self.n_track = n_src_views_temporal_track_one_side
        self.with_track_sources = with_track_sources
        self.traj = []
        self._scene_cache = {}

        for scene in scene_ids:
            ks, c2ws, names = self._scene_cams(scene)
            n = len(names)
            times = np.linspace(
                max(0, vis_center_time - vis_time_interval),
                min(n - 2, vis_center_time + vis_time_interval),
                n_render_frames,
            )
            # bullet-time amplitude scaled by the scene's near-depth scale
            bounds = []
            for name in names:
                zs = np.load(self.root / scene / f"depths/{name}.npz")["depth"].reshape(-1)
                bounds.append(np.percentile(zs, 5))
            bt_disp_sc = 1.0 / (np.percentile(np.asarray(bounds), 5) * 0.9)
            bt = create_bt_poses(
                ks[0][0, 0],
                num_frames=max(1, n_render_frames // N_BT_REPS),
                max_disp=vis_bt_max_disp,
                sc=bt_disp_sc,
            )
            bt = bt * (N_BT_REPS + 1)
            for i, t in enumerate(times):
                it = int(np.floor(t))
                ratio = float(t - np.floor(t))
                rot, trans = linear_pose_interp(
                    c2ws[it][:3, 3], c2ws[it][:3, :3],
                    c2ws[it + 1][:3, 3], c2ws[it + 1][:3, :3], ratio,
                )
                c2w = np.eye(4)
                c2w[:3, :3] = rot
                c2w[:3, 3] = trans
                self.traj.append((scene, float(t), i, c2w @ bt[i]))

    def _scene_cams(self, scene):
        if scene not in self._scene_cache:
            pose_fs = sorted((self.root / scene / "poses").glob("*.npz"))
            names = [f.stem for f in pose_fs]
            ks, c2ws = [], []
            for f in pose_fs:
                info = np.load(f)
                k = np.asarray(info["K"], np.float64)
                if k.shape == (3, 3):
                    k4 = np.eye(4)
                    k4[:3, :3] = k
                    k = k4
                ks.append(k)
                c2ws.append(np.asarray(info["c2w"], np.float64))
            self._scene_cache[scene] = (ks, c2ws, names)
        return self._scene_cache[scene]

    def __len__(self):
        return len(self.traj)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def _read_rgb(self, scene, name):
        for ext in (".png", ".jpg"):
            p = self.root / scene / f"rgbs/{name}{ext}"
            if p.exists():
                return np.array(PIL.Image.open(p)).astype(np.float32) / 255.0
        raise FileNotFoundError(f"{scene}/rgbs/{name}")

    def _read_mask(self, scene, name, h, w):
        m = np.array(PIL.Image.open(self.root / scene / f"masks/final/{name}_final.png"))
        if m.ndim == 3:
            m = m[..., 0]
        if m.shape != (h, w):
            m = np.array(
                PIL.Image.fromarray(m).resize((w, h), PIL.Image.Resampling.NEAREST)
            )
        return (m > 0).astype(np.float32)[..., None]

    def _read_flow(self, scene, names, i, j, h, w):
        if i == j:
            return np.zeros((h, w, 2), np.float32), np.zeros((h, w, 1), np.float32)
        p = (
            self.root
            / scene
            / f"flows/interval_{abs(j - i)}/{names[i]}_{names[j]}.npz"
        )
        info = np.load(p)
        occ = (
            np.sum(np.abs(info["coord_diff"]), axis=2) > self.flow_consist_thres
        ).astype(np.float32)[..., None]
        return info["flow"].astype(np.float32), occ

    def __getitem__(self, index):
        scene, tgt_time, frame_i, tgt_c2w = self.traj[index]
        ks, c2ws, names = self._scene_cams(scene)
        n = len(names)

        temporal = sorted(
            {
                f
                for f in (
                    int(np.floor(tgt_time)) if tgt_time > 0 else None,
                    int(np.floor(tgt_time)) + 1 if tgt_time < n - 1 else None,
                )
                if f is not None
            }
        )
        n_actual = len(temporal)
        if n_actual == 1:
            temporal.append(temporal[0])

        # the mono reference ranks ALL frames by camera distance (no +-12
        # pool, unlike nvidia_vis) — mono_vis.py:341-349
        from pgdvs_tpu.core.geometry import sort_poses_wrt_ref

        order = sort_poses_wrt_ref(tgt_c2w, np.stack(c2ws), metric="dist")
        spatial = sorted(np.asarray(order)[: self.n_spatial].tolist())

        def bundle(ids):
            rgbs, masks, depths, cams = [], [], [], []
            for i in ids:
                rgb = self._read_rgb(scene, names[i])
                h, w = rgb.shape[:2]
                rgbs.append(rgb)
                masks.append(self._read_mask(scene, names[i], h, w))
                depths.append(
                    np.load(self.root / scene / f"depths/{names[i]}.npz")[
                        "depth"
                    ].astype(np.float32)[..., None]
                )
                cams.append(
                    np.concatenate(
                        [[h, w], ks[i].ravel(), c2ws[i].ravel()]
                    ).astype(np.float32)
                )
            return (np.stack(rgbs), np.stack(masks), np.stack(depths), np.stack(cams))

        sp_rgb, sp_mask, sp_depth, sp_cam = bundle(spatial)
        tp_rgb, tp_mask, tp_depth, tp_cam = bundle(temporal)
        h, w = sp_rgb.shape[1:3]

        pts = []
        for i, fid in enumerate(spatial):
            pts.append(
                np.asarray(
                    unproject_depth(sp_depth[i][..., 0], ks[fid], c2ws[fid])
                ).reshape(-1, 3)
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

        flow_fwd, fo = self._read_flow(scene, names, temporal[0], temporal[1], h, w)
        flow_bwd, bo = self._read_flow(scene, names, temporal[1], temporal[0], h, w)

        # virtual camera reuses frame 0's K (mono_vis.py:369-373)
        flat_cam_tgt = np.concatenate(
            [[h, w], ks[0].ravel(), tgt_c2w.ravel()]
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
            "flow_fwd_occ_mask": fo,
            "flow_bwd": flow_bwd,
            "flow_bwd_occ_mask": bo,
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
                "n_actual_temporal": n_actual,
            },
            # +-K track windows, left-aligned canonical layout (the
            # reference's bwd window also includes temporal[1] itself as
            # slot 0 — the same K+1-slot quirk as nvidia_vis, outcome-
            # neutral downstream)
            **(self._track_sources(scene, temporal, tgt_time, n, bundle)
               if self.with_track_sources else {}),
        }

    def _track_sources(self, scene, temporal, tgt_time, n_frames, bundle):
        # windows exist only when the virtual time has room on that side
        # (reference guards on tgt_time, not on temporal[0/1])
        fwd_ids = (
            list(range(max(0, temporal[0] - self.n_track), temporal[0]))
            if tgt_time > 0
            else []
        )
        bwd_ids = (
            list(
                range(
                    temporal[1] + 1, min(n_frames, temporal[1] + 1 + self.n_track)
                )
            )
            if tgt_time < n_frames - 1
            else []
        )
        out = {}
        for name_, ids, fill in (
            ("fwd", fwd_ids, temporal[0]), ("bwd", bwd_ids, temporal[1])
        ):
            padded = ids + [fill] * (self.n_track - len(ids))
            r, m, d, c = bundle(padded)
            out[f"rgb_src_track_{name_}"] = r
            out[f"dyn_mask_src_track_{name_}"] = m
            out[f"depth_src_track_{name_}"] = d
            out[f"flat_cam_src_track_{name_}"] = c
            out[f"time_src_track_{name_}"] = np.array(padded, np.float32)
            out[f"n_actual_src_track_{name_}"] = np.array([len(ids)], np.int64)
        return out
