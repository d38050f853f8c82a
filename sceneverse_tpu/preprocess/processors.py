"""Per-dataset offline scene processors (reference preprocess/{rscan,
multiscan,arkitscenes,structured3d}.py): raw release -> per-scan
``(vertices, colors, instance)`` .pth + ``instance_id_to_label`` .pth in the
layout the data layer consumes.

Shared pipeline (reference rscan.py:42-111):
  per-vertex instance ids (KDTree / box containment)
  -> axis-alignment by bbox-rotation histogram (align_utils, vectorized)
  -> colors to [0, 255] -> floor-centered translation -> 240K point cap
  -> save .pth outputs + train/val split files.

Mesh IO is native (preprocess.mesh_io) — no trimesh/open3d dependency.
"""

from __future__ import annotations

import json
import re
from glob import glob
from pathlib import Path

import numpy as np

from sceneverse_tpu.preprocess import label_convert as LC
from sceneverse_tpu.preprocess.align_utils import (
    calc_align_matrix,
    compute_box_3d,
    rotate_z_axis_by_degrees,
)
from sceneverse_tpu.preprocess.build import PROCESSOR_REGISTRY, ProcessorBase
from sceneverse_tpu.preprocess.mesh_io import load_ply

PTS_LIMIT = 240_000  # offline scene point cap (reference preprocess/README.md)


def _save_torch(obj, path):
    import torch

    torch.save(obj, str(path))


class _SceneProcessor(ProcessorBase):
    """Common machinery: split recording, parallel driving, final save."""

    def record_splits(self, scan_ids, ratio=0.8):
        split_dir = self.save_root / "split"
        split_dir.mkdir(parents=True, exist_ok=True)
        if (split_dir / "train_split.txt").exists():
            return
        scan_ids = sorted(scan_ids)
        n_train = int(ratio * len(scan_ids)) + 1
        splits = {"train": scan_ids[:n_train], "val": scan_ids[n_train:]}
        for name, ids in splits.items():
            (split_dir / f"{name}_split.txt").write_text("\n".join(ids))

    def _finalize_and_save(self, scan_id, vertices, vertex_colors,
                           vertex_instance, inst_to_label, bbox_list=None,
                           align=True):
        align_angle = 0.0
        if align and bbox_list:
            align_angle = calc_align_matrix(bbox_list)
            vertices = rotate_z_axis_by_degrees(np.asarray(vertices), align_angle)
        vertices = np.asarray(vertices, np.float64)
        vertex_colors = np.asarray(vertex_colors, np.float64)
        if vertex_colors.max() <= 1:
            vertex_colors = vertex_colors * 255.0
        center = vertices.mean(axis=0)
        center[2] = vertices[:, 2].min()
        vertices = vertices - center
        vertex_instance = np.asarray(vertex_instance)
        assert vertex_colors.shape == vertices.shape
        assert vertex_colors.shape[0] == vertex_instance.shape[0]
        if vertices.shape[0] > PTS_LIMIT:
            idx = np.random.choice(vertices.shape[0], PTS_LIMIT, replace=False)
            vertices, vertex_colors, vertex_instance = (
                vertices[idx], vertex_colors[idx], vertex_instance[idx]
            )
        if self.check_key(self.output.get("pcd")):
            _save_torch(inst_to_label, self.inst2label_path / f"{scan_id}.pth")
            _save_torch((vertices, vertex_colors, vertex_instance),
                        self.pcd_path / f"{scan_id}.pth")
            np.save(self.pcd_path / f"{scan_id}_align_angle.npy", align_angle)

    def process_scans(self):
        scan_ids = self.read_all_scans()
        self.log_starting_info(len(scan_ids))
        if self.num_workers > 1:
            from joblib import Parallel, delayed

            Parallel(n_jobs=self.num_workers)(
                delayed(self.scene_proc)(s) for s in scan_ids
            )
        else:
            for s in scan_ids:
                self.scene_proc(s)
        self.record_splits(self._split_ids(scan_ids))

    def _split_ids(self, scan_ids):
        return scan_ids


def _load_obj_with_texture(obj_path):
    """Minimal OBJ reader with texture-sampled vertex colors (replaces
    trimesh's uv_to_color path, reference rscan.py:103-104)."""
    verts, uvs, vert_uv = [], [], {}
    mtl_image = None
    obj_path = Path(obj_path)
    for line in open(obj_path, encoding="utf-8", errors="replace"):
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "v":
            verts.append([float(x) for x in parts[1:4]])
        elif parts[0] == "vt":
            uvs.append([float(parts[1]), float(parts[2])])
        elif parts[0] == "f":
            for token in parts[1:4]:
                ids = token.split("/")
                vi = int(ids[0]) - 1
                if len(ids) > 1 and ids[1]:
                    vert_uv[vi] = int(ids[1]) - 1
        elif parts[0] == "mtllib":
            mtl = obj_path.parent / parts[1]
            if mtl.exists():
                for ml in open(mtl, encoding="utf-8", errors="replace"):
                    mp = ml.split()
                    if mp and mp[0] in ("map_Kd",):
                        mtl_image = obj_path.parent / mp[1]
    vertices = np.asarray(verts, np.float64)
    colors = np.full_like(vertices, 0.5)
    if mtl_image is not None and mtl_image.exists() and uvs:
        from PIL import Image

        img = np.asarray(Image.open(mtl_image).convert("RGB"), np.float64) / 255.0
        h, w = img.shape[:2]
        uvs = np.asarray(uvs, np.float64)
        for vi, ti in vert_uv.items():
            u, v = uvs[ti]
            px = min(int(u * (w - 1)), w - 1)
            py = min(int((1 - v) * (h - 1)), h - 1)
            colors[vi] = img[py, px]
    return vertices, colors


@PROCESSOR_REGISTRY.register()
class RScanProcessor(_SceneProcessor):
    """3RScan (reference preprocess/rscan.py:18-149)."""

    def read_all_scans(self):
        return [p.split("/")[-1] for p in glob(str(self.data_root) + "/*")]

    def scene_proc(self, scan_id):
        root = self.data_root / scan_id
        if not (root / "labels.instances.annotated.v2.ply").exists():
            return
        vertices, vertex_colors = _load_obj_with_texture(root / "mesh.refined.v2.obj")
        label_ply = load_ply(root / "labels.instances.annotated.v2.ply")
        segments = json.load(open(root / "mesh.refined.0.010000.segs.v2.json",
                                  encoding="utf-8"))
        aggregation = json.load(open(root / "semseg.v2.json", encoding="utf-8"))
        self.process_point_cloud(
            scan_id, vertices, vertex_colors, label_ply, segments, aggregation
        )

    def process_point_cloud(self, scan_id, vertices, vertex_colors, label_ply,
                            segments, aggregation):
        from scipy.spatial import cKDTree

        seg_indices = np.asarray(segments["segIndices"])
        seg_to_inst = {}
        inst_to_label = {}
        bbox_list = []
        for group in aggregation["segGroups"]:
            if group["label"] not in LC.RSCAN_SCANNET:
                continue
            inst_to_label[group["id"]] = LC.RSCAN_SCANNET[group["label"]]
            rotation = np.asarray(group["obb"]["normalizedAxes"]).reshape(3, 3)
            centroid = np.asarray(group["obb"]["centroid"]).reshape(3)
            scale = np.asarray(group["obb"]["axesLengths"]).reshape(3)
            bbox_list.append(compute_box_3d(scale.tolist(), centroid, rotation))
            for seg in group["segments"]:
                seg_to_inst[seg] = group["id"]

        # nearest label-mesh vertex within 0.1m assigns the instance
        # (reference rscan.py:74-91, vectorized with one KDTree query)
        tree = cKDTree(np.asarray(label_ply["vertices"], np.float64))
        dist, nn = tree.query(vertices, k=1)
        seg_of_nn = seg_indices[nn]
        lut = np.full(int(seg_indices.max()) + 1, -1, np.int64)
        for seg, inst in seg_to_inst.items():
            if seg < lut.shape[0]:
                lut[seg] = inst
        instance = np.where(dist <= 0.1, lut[seg_of_nn], -1)
        self._finalize_and_save(
            scan_id, vertices, vertex_colors, instance, inst_to_label, bbox_list
        )


@PROCESSOR_REGISTRY.register()
class MultiScanProcessor(_SceneProcessor):
    """MultiScan (reference preprocess/multiscan.py): per-face objectId plys +
    semantic annotation jsons."""

    def read_all_scans(self):
        out = []
        for p in glob(str(self.data_root) + "/*"):
            m = re.findall(r"scene\_[0-9]{5}\_[0-9]{2}", p)
            if m:
                out.append(m[0])
        return sorted(set(out))

    def scene_proc(self, scan_id):
        root = self.data_root / scan_id
        ply_path = root / f"{scan_id}.ply"
        anno_path = root / f"{scan_id}.annotations.json"
        if not ply_path.exists() or not anno_path.exists():
            return
        annotations = json.load(open(anno_path, encoding="utf-8"))
        mesh = load_ply(ply_path)
        vertices = np.asarray(mesh["vertices"], np.float64)
        colors = (np.asarray(mesh["colors"], np.float64)
                  if mesh["colors"] is not None else np.full_like(vertices, 127.0))

        # object label map from annotations: objects carry 'objectId'+'label'
        inst_to_label = {}
        for obj in annotations.get("objects", []):
            label = obj["label"].split(".")[0]
            if label in LC.MULTISCAN_SCANNET:
                inst_to_label[obj["objectId"]] = LC.MULTISCAN_SCANNET[label]

        # per-face objectId -> per-vertex instance (majority by first face)
        instance = np.full(vertices.shape[0], -1, np.int64)
        faces = mesh.get("faces")
        face_objs = mesh.get("face_object_ids")
        if faces is not None and face_objs is not None:
            for f, oid in zip(faces, face_objs):
                if oid in inst_to_label:
                    instance[f] = oid
        self._finalize_and_save(
            scan_id, vertices, colors, instance, inst_to_label, align=False
        )


@PROCESSOR_REGISTRY.register()
class ARKitScenesProcessor(_SceneProcessor):
    """ARKitScenes (reference preprocess/arkitscenes.py): oriented-box
    containment labels each vertex; boxes drive axis alignment."""

    def read_all_scans(self):
        out = []
        for split in ("Training", "Validation"):
            for p in glob(str(self.data_root) + f"/{split}/*"):
                out.append((split, p.split("/")[-1]))
        return out

    def _split_ids(self, scan_ids):
        return [s[1] for s in scan_ids]

    def record_splits(self, scan_ids, ratio=None):
        split_dir = self.save_root / "split"
        split_dir.mkdir(parents=True, exist_ok=True)
        train = [s for s in self._all_scans if s[0] == "Training"]
        val = [s for s in self._all_scans if s[0] == "Validation"]
        (split_dir / "train_split.txt").write_text("\n".join(s[1] for s in train))
        (split_dir / "val_split.txt").write_text("\n".join(s[1] for s in val))

    def process_scans(self):
        self._all_scans = self.read_all_scans()
        self.log_starting_info(len(self._all_scans))
        for split, scan_id in self._all_scans:
            self.scene_proc(split, scan_id)
        self.record_splits(None)

    def scene_proc(self, split, scan_id):
        root = self.data_root / split / scan_id
        ply_path = root / f"{scan_id}_3dod_mesh.ply"
        anno_path = root / f"{scan_id}_3dod_annotation.json"
        if not ply_path.exists() or not anno_path.exists():
            return
        mesh = load_ply(ply_path)
        vertices = np.asarray(mesh["vertices"], np.float64)
        colors = (np.asarray(mesh["colors"], np.float64)
                  if mesh["colors"] is not None else np.full_like(vertices, 127.0))
        annotations = json.load(open(anno_path, encoding="utf-8"))

        instance = np.zeros(vertices.shape[0], np.int64)
        inst_to_label = {}
        bbox_list = []
        for i, info in enumerate(annotations["data"]):
            label = info["label"]
            if label not in LC.ARKITSCENE_SCANNET:
                continue
            obj_id = i + 1
            obb = info["segments"]["obbAligned"]
            rotation = np.asarray(obb["normalizedAxes"]).reshape(3, 3)
            centroid = np.asarray(obb["centroid"]).reshape(3)
            scale = np.asarray(obb["axesLengths"]).reshape(3)
            # analytic oriented-box containment (replaces trimesh.contains)
            local = (vertices - centroid) @ rotation.T
            inside = np.all(np.abs(local) <= scale / 2 + 1e-9, axis=1)
            instance[inside] = obj_id
            inst_to_label[obj_id] = LC.ARKITSCENE_SCANNET[label]
            bbox_list.append(compute_box_3d(scale.tolist(), centroid, rotation))
        if not bbox_list:
            return
        self._finalize_and_save(
            scan_id, vertices, colors, instance, inst_to_label, bbox_list
        )


@PROCESSOR_REGISTRY.register()
class Structured3DProcessor(_SceneProcessor):
    """Structured3D (reference preprocess/structured3d.py): point clouds with
    axis-aligned gt boxes; classes 38/39/40 (walls etc.) skipped."""

    def read_all_scans(self):
        out = []
        for split in ("train", "val", "test"):
            for p in glob(str(self.data_root) + f"/{split}/*"):
                stem = p.split("/")[-1]
                out.append((split, "_".join(stem.split("_")[:-2])))
        return out

    def process_scans(self):
        scans = self.read_all_scans()
        self.log_starting_info(len(scans))
        for split, scan_id in scans:
            self.scene_proc(split, scan_id)
        split_dir = self.save_root / "split"
        split_dir.mkdir(parents=True, exist_ok=True)
        for name in ("train", "val", "test"):
            ids = [s[1] for s in scans if s[0] == name]
            (split_dir / f"{name}_split.txt").write_text("\n".join(ids))

    def scene_proc(self, split, scan_id):
        root = self.data_root / split
        pc_path = root / f"{scan_id}_point_cloud.npy"
        anno_path = root / f"{scan_id}_annotation.npy"
        if not pc_path.exists() or not anno_path.exists():
            return
        data = np.load(pc_path, allow_pickle=True)
        annotations = np.load(anno_path, allow_pickle=True).item()
        vertices = np.asarray(data[:, :3], np.float64)
        colors = (np.asarray(data[:, 3:6], np.float64) + 1) / 2.0 * 255.0

        instance = -np.ones(vertices.shape[0], np.int64)
        inst_to_label = {}
        for _id, box in enumerate(annotations["gt_boxes_upright_depth"]):
            cls = annotations["class"][_id]
            if cls in (38, 39, 40):
                continue
            centroid, dim = np.asarray(box[:3]), np.asarray(box[3:6])
            inside = np.all(
                (vertices > centroid - dim / 2) & (vertices < centroid + dim / 2),
                axis=1,
            )
            instance[inside] = _id
            inst_to_label[_id] = LC.S3D_SCANNET[cls]
        self._finalize_and_save(
            scan_id, vertices, colors, instance, inst_to_label, align=False
        )
