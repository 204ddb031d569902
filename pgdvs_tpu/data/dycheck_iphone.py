"""DyCheck iPhone dataset (Nerfies/DyCheck capture format).

Equivalent of ``/root/reference/pgdvs/datasets/dycheck_iphone_eval.py`` +
``dycheck_utils.py``. On-disk layout per scene:

  scene.json                      {center, scale, near, far}
  dataset.json / metadata.json    frame names, time_id/camera_id maps
  splits/<split>.json             {frame_names, time_ids, camera_ids}
  rgb/<factor>x/<frame>.png
  depth/<factor>x/<frame>.npy     (scaled by scene scale on load)
  camera/<frame>.json             DyCheck camera (OpenCV, w2c orientation)
  covisible/<factor>x/val/<frame>.png

Protocol facts preserved: spatial source selection by KMeans clustering of
train camera centers (nearest clusters -> temporally closest member,
``dycheck_iphone_eval.py:357-393``); per-pixel [H, W, 2] depth range pinned
to projected static source depths ±1e-4 (``:455-525``); covisible masks as
the evaluation region.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np
import PIL.Image


class DyCheckCamera:
    """OpenCV-model camera: orientation = world->camera rotation."""

    def __init__(self, d):
        self.orientation = np.asarray(d["orientation"], np.float32)
        self.position = np.asarray(d["position"], np.float32)
        self.focal_length = float(d["focal_length"])
        self.principal_point = np.asarray(d["principal_point"], np.float32)
        self.image_size = np.asarray(d["image_size"], np.int64)  # (W, H)
        self.skew = float(d.get("skew", 0.0))
        self.pixel_aspect_ratio = float(d.get("pixel_aspect_ratio", 1.0))

    @classmethod
    def from_json(cls, path):
        with open(path) as f:
            return cls(json.load(f))

    def rescale(self, scale: float) -> "DyCheckCamera":
        out = DyCheckCamera.__new__(DyCheckCamera)
        out.orientation = self.orientation
        out.position = self.position
        out.focal_length = self.focal_length * scale
        out.principal_point = self.principal_point * scale
        out.image_size = np.round(self.image_size * scale).astype(np.int64)
        out.skew = self.skew
        out.pixel_aspect_ratio = self.pixel_aspect_ratio
        return out

    @property
    def intrin4(self):
        k = np.eye(4, dtype=np.float32)
        k[0, 0] = self.focal_length
        k[0, 1] = self.skew
        k[1, 1] = self.focal_length * self.pixel_aspect_ratio
        k[0, 2] = self.principal_point[0]
        k[1, 2] = self.principal_point[1]
        return k

    @property
    def w2c(self):
        t = -self.orientation @ self.position
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = self.orientation
        m[:3, 3] = t
        return m

    @property
    def c2w(self):
        return np.linalg.inv(self.w2c)


class IPhoneParser:
    """Reader for one DyCheck iPhone capture directory."""

    def __init__(self, data_dir, factor: int = 2):
        self.dir = pathlib.Path(data_dir)
        self.factor = factor
        with open(self.dir / "scene.json") as f:
            scene = json.load(f)
        self.center = np.asarray(scene["center"], np.float32)
        self.scale = float(scene["scale"])
        self.near = float(scene["near"])
        self.far = float(scene["far"])
        with open(self.dir / "metadata.json") as f:
            self.metadata = json.load(f)
        with open(self.dir / "dataset.json") as f:
            self.dataset = json.load(f)
        # the DyCheck capture format stores the processing factor in
        # extra.json (dycheck_utils.py:246-253); it overrides the arg so the
        # reader matches whatever resolution the capture ships
        extra_f = self.dir / "extra.json"
        if extra_f.exists():
            with open(extra_f) as f:
                self.factor = int(json.load(f)["factor"])

    def load_split(self, split: str):
        with open(self.dir / "splits" / f"{split}.json") as f:
            d = json.load(f)
        return d["frame_names"], d["time_ids"], d["camera_ids"]

    def frame_name(self, time_id: int, camera_id: int) -> str:
        return f"{camera_id}_{time_id:05d}"

    def load_rgb(self, frame_name: str):
        p = self.dir / "rgb" / f"{self.factor}x" / f"{frame_name}.png"
        rgba = np.array(PIL.Image.open(p))
        return rgba[..., :3].astype(np.float32) / 255.0

    def load_depth(self, frame_name: str):
        p = self.dir / "depth" / f"{self.factor}x" / f"{frame_name}.npy"
        return (np.load(p, allow_pickle=True) * self.scale).astype(np.float32)

    def load_camera(self, frame_name: str) -> DyCheckCamera:
        cam = DyCheckCamera.from_json(self.dir / "camera" / f"{frame_name}.json")
        cam = cam.rescale(1.0 / self.factor)
        # world frame normalization: recenter + rescale like DyCheck
        out = DyCheckCamera.__new__(DyCheckCamera)
        out.orientation = cam.orientation
        out.position = (cam.position - self.center) * self.scale
        out.focal_length = cam.focal_length
        out.principal_point = cam.principal_point
        out.image_size = cam.image_size
        out.skew = cam.skew
        out.pixel_aspect_ratio = cam.pixel_aspect_ratio
        return out

    def load_covisible(self, frame_name: str, split: str = "val"):
        p = self.dir / "covisible" / f"{self.factor}x" / split / f"{frame_name}.png"
        m = np.array(PIL.Image.open(p))
        if m.ndim == 3:
            m = m[..., 0]
        return (m > 0).astype(np.float32)


class DyCheckIPhoneEvalDataset:
    def __init__(
        self,
        data_root,
        scene_ids,
        factor: int = 2,
        n_src_views_spatial: int = 10,
        mask_data_dir=None,
        flow_data_dir=None,
        flow_consist_thres: float = 1.0,
        spatial_src_view_type: str = "clustered",
        n_src_views_spatial_cluster=None,
        n_src_views_temporal_track_one_side: int = 5,
        with_track_sources: bool = False,
    ):
        self.root = pathlib.Path(data_root)
        self.n_spatial = n_src_views_spatial
        # reference default: cluster count == n_src_views_spatial
        # (dycheck_iphone_eval.py:70-73, configs/dataset/combined.yaml:56)
        self.n_clusters = (
            n_src_views_spatial
            if n_src_views_spatial_cluster is None
            else n_src_views_spatial_cluster
        )
        self.n_track = n_src_views_temporal_track_one_side
        self.with_track_sources = with_track_sources
        self.spatial_src_view_type = spatial_src_view_type
        self.mask_dir = pathlib.Path(mask_data_dir) if mask_data_dir else None
        self.flow_dir = pathlib.Path(flow_data_dir) if flow_data_dir else None
        self.flow_consist_thres = flow_consist_thres

        self.parsers = {s: IPhoneParser(self.root / s, factor) for s in scene_ids}
        self.items = []
        self._train_cache = {}
        for scene in scene_ids:
            names, time_ids, cam_ids = self.parsers[scene].load_split("val")
            for n, t, c in zip(names, time_ids, cam_ids):
                self.items.append((scene, n, int(t), int(c)))

    def __len__(self):
        return len(self.items)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def _train_info(self, scene):
        if scene not in self._train_cache:
            p = self.parsers[scene]
            names, time_ids, cam_ids = p.load_split("train")
            c2ws = np.stack([p.load_camera(n).c2w for n in names])
            self._train_cache[scene] = (names, list(map(int, time_ids)), c2ws)
        return self._train_cache[scene]

    def _dyn_mask(self, scene, frame_name, h, w):
        """Dynamic mask from the preprocessed mask dir; falls back to
        all-dynamic (conservative) when missing."""
        if self.mask_dir is not None:
            p = self.mask_dir / scene / f"masks/final/{frame_name}_final.png"
            if p.exists():
                m = np.array(PIL.Image.open(p))
                if m.ndim == 3:
                    m = m[..., 0]
                if m.shape != (h, w):
                    m = np.array(
                        PIL.Image.fromarray(m).resize(
                            (w, h), PIL.Image.Resampling.NEAREST
                        )
                    )
                return (m > 0).astype(np.float32)[..., None]
        return np.ones((h, w, 1), np.float32)

    def _flow(self, scene, name_a, name_b, h, w):
        if self.flow_dir is not None and name_a != name_b:
            for interval in (1, 2):
                p = self.flow_dir / scene / f"flows/interval_{interval}/{name_a}_{name_b}.npz"
                if p.exists():
                    info = np.load(p)
                    occ = (
                        np.sum(np.abs(info["coord_diff"]), axis=2)
                        > self.flow_consist_thres
                    ).astype(np.float32)[..., None]
                    return info["flow"].astype(np.float32), occ
        return np.zeros((h, w, 2), np.float32), np.zeros((h, w, 1), np.float32)

    def _select_spatial(self, scene, tgt_c2w, tgt_time):
        """KMeans-clustered selection (dycheck_iphone_eval.py:357-393)."""
        names, time_ids, c2ws = self._train_info(scene)
        if self.spatial_src_view_type == "clustered":
            from sklearn.cluster import KMeans

            km = KMeans(
                n_clusters=min(self.n_clusters, len(names)),
                random_state=0,
                n_init="auto",
            ).fit(c2ws[:, :3, 3])
            dists = np.linalg.norm(km.cluster_centers_ - tgt_c2w[:3, 3], axis=1)
            chosen = []
            for label in np.argsort(dists)[: self.n_spatial]:
                members = np.nonzero(km.labels_ == label)[0]
                # temporally-closest member; like the reference, frame INDEX
                # stands in for time (train times are consecutive, so index
                # == time - min_time — dycheck_iphone_eval.py:385-393)
                t_dist = np.abs(members.astype(np.float32) - float(tgt_time))
                chosen.append(int(members[np.argmin(t_dist)]))
            return sorted(chosen)
        from pgdvs_tpu.core.geometry import sort_poses_wrt_ref

        if self.spatial_src_view_type == "closest_wo_temporal":
            order = sort_poses_wrt_ref(tgt_c2w, c2ws, metric="dist_matrix")
            return sorted(np.asarray(order)[: self.n_spatial].tolist())
        if self.spatial_src_view_type == "closest_with_temporal":
            # pre-filter to the 4*n temporally-nearest frames, then rank by
            # camera distance (dycheck_iphone_eval.py:330-357)
            t_dist = np.abs(
                np.arange(len(names), dtype=np.float32) - float(tgt_time)
            )
            pool = np.argsort(t_dist)[: self.n_spatial * 4]
            order = sort_poses_wrt_ref(
                tgt_c2w, c2ws[pool], metric="dist_matrix"
            )
            return sorted(pool[np.asarray(order)][: self.n_spatial].tolist())
        raise ValueError(self.spatial_src_view_type)

    def __getitem__(self, index):
        scene, tgt_name, tgt_time, tgt_cam = self.items[index]
        p = self.parsers[scene]
        names, time_ids, c2ws = self._train_info(scene)

        tgt_camera = p.load_camera(tgt_name)
        tgt_c2w = tgt_camera.c2w
        rgb_tgt = p.load_rgb(tgt_name)
        h, w = rgb_tgt.shape[:2]
        covis = p.load_covisible(tgt_name)

        # temporal sources (reference semantics, dycheck_iphone_eval.py:
        # 229-262): a target whose time is IN the train video uses that same
        # frame alone (the multi-camera rig shares timestamps); otherwise
        # the nearest older + nearest newer train times
        tids = np.asarray(time_ids)
        temporal_idx = []
        if tgt_time in tids:
            temporal_idx.append(int(np.nonzero(tids == tgt_time)[0][0]))
        else:
            older = tids[tids < tgt_time]
            newer = tids[tids > tgt_time]
            if older.size:
                temporal_idx.append(int(np.nonzero(tids == older.max())[0][0]))
            if newer.size:
                temporal_idx.append(int(np.nonzero(tids == newer.min())[0][0]))
        n_actual = len(temporal_idx)
        if n_actual == 1:
            temporal_idx.append(temporal_idx[0])
        temporal_idx = sorted(temporal_idx)

        spatial_idx = self._select_spatial(scene, tgt_c2w, tgt_time)

        def bundle(idxs):
            rgbs, masks, depths, cams, pcls, dyn = [], [], [], [], [], []
            for i in idxs:
                cam = p.load_camera(names[i])
                rgb = p.load_rgb(names[i])
                depth = p.load_depth(names[i])
                if depth.ndim == 3:
                    depth = depth[..., 0]
                dmask = self._dyn_mask(scene, names[i], h, w)
                cams.append(
                    np.concatenate(
                        [[h, w], cam.intrin4.ravel(), cam.c2w.ravel()]
                    ).astype(np.float32)
                )
                rgbs.append(rgb)
                depths.append(depth[..., None])
                masks.append(dmask)
                from pgdvs_tpu.core.geometry import unproject_depth

                pcls.append(
                    np.asarray(unproject_depth(depth, cam.intrin4, cam.c2w)).reshape(-1, 3)
                )
                dyn.append(dmask.reshape(-1) > 0)
            return (
                np.stack(rgbs),
                np.stack(masks),
                np.stack(depths),
                np.stack(cams),
                np.concatenate(pcls),
                np.concatenate(dyn),
            )

        sp_rgb, sp_mask, sp_depth, sp_cam, sp_pcl, sp_dyn = bundle(spatial_idx)
        tp_rgb, tp_mask, tp_depth, tp_cam, _, _ = bundle(temporal_idx)

        # scalar depth range from spatial pcl quantiles clamped to scene
        pts_h = np.concatenate([sp_pcl, np.ones_like(sp_pcl[:, :1])], axis=1)
        cam_pts = (np.linalg.inv(tgt_c2w) @ pts_h.T).T
        dr_min = max(p.near, float(np.quantile(cam_pts[:, 2], 0.1)))
        dr_max = min(p.far, float(np.quantile(cam_pts[:, 2], 0.9)))
        depth_range = np.tile(
            np.array([dr_min, dr_max], np.float32).reshape(1, 1, 2), (h, w, 1)
        )

        # pin per-pixel range to projected static source depths ±1e-4
        static_pcl = sp_pcl[~sp_dyn]
        if static_pcl.shape[0] > 0:
            sh = np.concatenate([static_pcl, np.ones_like(static_pcl[:, :1])], 1)
            cam_static = (np.linalg.inv(tgt_c2w) @ sh.T).T[:, :3]
            pix = (tgt_camera.intrin4[:3, :3] @ cam_static.T).T
            uv = pix[:, :2] / (pix[:, 2:] + 1e-8)
            ok = (
                (uv[:, 0] >= 0)
                & (uv[:, 0] <= w - 1)
                & (uv[:, 1] >= 0)
                & (uv[:, 1] <= h - 1)
            )
            # the reference TRUNCATES here, not rounds: it casts to int
            # before its (no-op) round (dycheck_iphone_eval.py:515-517)
            uvi = uv[ok].astype(int)
            zs = cam_static[ok, 2]
            depth_range[uvi[:, 1], uvi[:, 0], 0] = zs - 1e-4
            depth_range[uvi[:, 1], uvi[:, 0], 1] = zs + 1e-4

        flow_fwd, fo = self._flow(
            scene, names[temporal_idx[0]], names[temporal_idx[1]], h, w
        )
        flow_bwd, bo = self._flow(
            scene, names[temporal_idx[1]], names[temporal_idx[0]], h, w
        )

        flat_cam_tgt = np.concatenate(
            [[h, w], tgt_camera.intrin4.ravel(), tgt_c2w.ravel()]
        ).astype(np.float32)

        track = {}
        if self.with_track_sources:
            # +-K tracking frames clipped to the train time range
            # (dycheck_iphone_eval.py:266-306). Slot layout note: this
            # framework's canonical padding is LEFT-aligned actual frames
            # (like the reference's NVIDIA reader); the reference's DyCheck
            # reader right-aligns the fwd side — same frames, same counts,
            # different slot order (A/B reorders before comparing).
            min_t, max_t = int(tids.min()), int(tids.max())
            t0 = int(tids[temporal_idx[0]])
            t1 = int(tids[temporal_idx[1]])
            fwd_times = list(range(max(min_t, t0 - self.n_track), t0))
            bwd_times = list(range(t1 + 1, min(max_t + 1, t1 + 1 + self.n_track)))

            def to_idx(ts):
                return [int(np.nonzero(tids == t)[0][0]) for t in ts]

            for name_, ts, fill in (
                ("fwd", fwd_times, temporal_idx[0]),
                ("bwd", bwd_times, temporal_idx[1]),
            ):
                idxs = to_idx(ts) + [fill] * (self.n_track - len(ts))
                r, m, d, c, _, _ = bundle(idxs)
                track[f"rgb_src_track_{name_}"] = r
                track[f"dyn_mask_src_track_{name_}"] = m
                track[f"depth_src_track_{name_}"] = d
                track[f"flat_cam_src_track_{name_}"] = c
                track[f"time_src_track_{name_}"] = np.array(
                    [time_ids[i] for i in idxs], np.float32
                )
                track[f"n_actual_src_track_{name_}"] = np.array(
                    [len(ts)], np.int64
                )

        return {
            **track,
            "seq_ids": np.array(
                [tgt_time, *spatial_idx, *temporal_idx], np.int64
            ),
            "rgb_tgt": rgb_tgt,
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
            "depth_range": depth_range.astype(np.float32),
            "time_tgt": np.array([tgt_time], np.float32),
            "time_src_temporal": np.array(
                [time_ids[i] for i in temporal_idx], np.float32
            ),
            # [H, W, 1] like the reference's DyCheck reader (the NVIDIA one
            # emits 3 channels); the evaluator uses misc.covisible_mask
            "eval_mask": covis[..., None],
            "misc": {
                "scene_id": scene,
                "tgt_frame_name": tgt_name,
                "covisible_mask": covis[..., None],
                "n_actual_temporal": n_actual,
                "quant_type": "dycheck",
            },
        }
