"""Preprocessing tests: PLY IO round-trip, alignment search, and the RScan
processor end-to-end on a synthetic raw scan (OBJ + labels PLY + seg jsons),
verifying its output loads through the data layer's scan format."""

import json
import struct

import numpy as np
import pytest

from sceneverse_tpu.preprocess.align_utils import (
    calc_align_matrix,
    compute_box_3d,
    rotate_z_axis_by_degrees,
)
from sceneverse_tpu.preprocess.mesh_io import load_ply


def write_ascii_ply(path, vertices, colors=None):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(vertices)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for i, v in enumerate(vertices):
            row = f"{v[0]} {v[1]} {v[2]}"
            if colors is not None:
                row += f" {colors[i][0]} {colors[i][1]} {colors[i][2]}"
            f.write(row + "\n")


def test_ply_reader_ascii_and_binary(tmp_path):
    rng = np.random.RandomState(0)
    verts = rng.randn(10, 3).astype(np.float32)
    cols = rng.randint(0, 255, (10, 3)).astype(np.uint8)
    p = tmp_path / "a.ply"
    write_ascii_ply(p, verts, cols)
    out = load_ply(p)
    np.testing.assert_allclose(out["vertices"], verts, rtol=1e-5)
    np.testing.assert_array_equal(out["colors"], cols)

    # binary little endian with faces
    b = tmp_path / "b.ply"
    with open(b, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 3\n")
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"element face 1\n")
        f.write(b"property list uchar int vertex_indices\n")
        f.write(b"end_header\n")
        for v in [(0, 0, 0), (1, 0, 0), (0, 1, 0)]:
            f.write(struct.pack("<fff", *v))
        f.write(struct.pack("<Biii", 3, 0, 1, 2))
    out = load_ply(b)
    assert out["vertices"].shape == (3, 3)
    np.testing.assert_array_equal(out["faces"], [[0, 1, 2]])


def test_calc_align_matrix_recovers_rotation():
    rng = np.random.RandomState(1)
    true_angle = 17.0
    boxes = []
    for _ in range(6):
        center = rng.randn(3) * 2
        size = np.abs(rng.randn(3)) + 0.5
        box = compute_box_3d(size.tolist(), center, np.eye(3))
        boxes.append(rotate_z_axis_by_degrees(box, -true_angle))
    found = calc_align_matrix(boxes)
    aligned = rotate_z_axis_by_degrees(np.asarray(boxes[0]), found)
    assert abs(aligned[4][0] - aligned[5][0]) < 0.06  # bottom face aligned


def test_rscan_processor_end_to_end(tmp_path):
    from sceneverse_tpu.config import Config
    from sceneverse_tpu.preprocess.processors import RScanProcessor

    rng = np.random.RandomState(0)
    scan = tmp_path / "raw" / "scan0001"
    scan.mkdir(parents=True)

    # two clusters of points = two objects
    n = 60
    pts = np.concatenate([
        rng.randn(n, 3) * 0.2 + [0, 0, 1],
        rng.randn(n, 3) * 0.2 + [3, 0, 1],
    ])
    with open(scan / "mesh.refined.v2.obj", "w") as f:
        for p in pts:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
        f.write("f 1 2 3\n")
    write_ascii_ply(scan / "labels.instances.annotated.v2.ply", pts.astype(np.float32))
    json.dump({"segIndices": list(range(2 * n))},
              open(scan / "mesh.refined.0.010000.segs.v2.json", "w"))
    json.dump({"segGroups": [
        {"id": 1, "objectId": 1, "label": "chair",
         "segments": list(range(n)),
         "obb": {"normalizedAxes": np.eye(3).flatten().tolist(),
                 "centroid": [0, 0, 1], "axesLengths": [0.8, 0.8, 0.8]}},
        {"id": 2, "objectId": 2, "label": "table",
         "segments": list(range(n, 2 * n)),
         "obb": {"normalizedAxes": np.eye(3).flatten().tolist(),
                 "centroid": [3, 0, 1], "axesLengths": [0.8, 0.8, 0.8]}},
    ]}, open(scan / "semseg.v2.json", "w"))

    cfg = Config({
        "data_root": str(tmp_path / "raw"),
        "save_root": str(tmp_path / "out"),
        "num_workers": 1,
        "output": {"pcd": True},
    })
    proc = RScanProcessor(cfg)
    proc.process_scans()

    import torch

    pcd = torch.load(tmp_path / "out/scan_data/pcd_with_global_alignment/scan0001.pth",
                     weights_only=False)
    inst2label = torch.load(tmp_path / "out/scan_data/instance_id_to_label/scan0001.pth",
                            weights_only=False)
    vertices, colors, instance = pcd
    assert vertices.shape == (2 * n, 3)
    assert set(np.unique(instance)) <= {-1, 1, 2}
    assert (instance >= 1).sum() > n  # most points labeled
    assert inst2label == {1: "chair", 2: "table"}
    # floor-centered: min z == 0 approx shifted
    assert abs(vertices[:, 2].min()) < 1e-6
    # splits written
    assert (tmp_path / "out/split/train_split.txt").exists()


def test_save_ply_round_trip(tmp_path):
    """save_ply (the file-output half of the reference's open3d viewer,
    visualize_data.py:23-118) must round-trip through load_ply: vertices,
    colors, faces."""
    from sceneverse_tpu.preprocess.mesh_io import save_ply

    rng = np.random.RandomState(7)
    verts = rng.randn(17, 3).astype(np.float32)
    cols = rng.randint(0, 256, (17, 3)).astype(np.uint8)
    faces = rng.randint(0, 17, (5, 3)).astype(np.int64)

    p = save_ply(tmp_path / "full.ply", verts, cols, faces)
    out = load_ply(p)
    np.testing.assert_array_equal(out["vertices"], verts)
    np.testing.assert_array_equal(out["colors"], cols)
    np.testing.assert_array_equal(out["faces"], faces)

    # colors are clipped to u8 range; float inputs accepted
    p2 = save_ply(tmp_path / "clip.ply", verts,
                  np.array([[-5.0, 300.0, 128.0]] * 17))
    out2 = load_ply(p2)
    np.testing.assert_array_equal(out2["colors"][0], [0, 255, 128])

    # vertices-only variant
    out3 = load_ply(save_ply(tmp_path / "bare.ply", verts))
    np.testing.assert_array_equal(out3["vertices"], verts)
    assert out3["colors"] is None and out3["faces"] is None


def test_visualize_data_end_to_end(tmp_path, monkeypatch, capsys):
    """The visualizer CLI (reference visualize_data.py:93-118) over the
    synthetic fixture tree writes PNG renders AND colored .ply exports that
    re-read with matching geometry."""
    import sys

    import visualize_data
    from sceneverse_tpu.data.fixture import write_synthetic_tree
    from sceneverse_tpu.preprocess.mesh_io import load_ply

    root = tmp_path / "tree"
    write_synthetic_tree(root, n_scans=1)
    out = tmp_path / "viz"
    monkeypatch.setattr(sys, "argv", [
        "visualize_data.py", "--root", str(root), "--dataset", "scannet",
        "--vis_refer", "--out", str(out),
    ])
    visualize_data.main()

    pngs = sorted(p.name for p in out.glob("*.png"))
    plys = sorted(p.name for p in out.glob("*.ply"))
    assert len(pngs) >= 2 and len(plys) >= 2  # rgb + instances (+ refer)
    scan_id = sorted(
        p.stem for p in
        (root / "scan_data/pcd_with_global_alignment").glob("*.pth"))[0]
    points, colors, instance, _ = visualize_data.load_scan(root, scan_id)
    rgb = load_ply(out / f"{scan_id}_rgb.ply")
    np.testing.assert_allclose(rgb["vertices"], points.astype(np.float32),
                               rtol=1e-6)
    np.testing.assert_array_equal(
        rgb["colors"], np.clip(colors, 0, 255).astype(np.uint8))
    # instance export colors by the deterministic ScanNet-200 palette
    inst = load_ply(out / f"{scan_id}_inst.ply")
    expect = np.clip(visualize_data.instance_colors(instance), 0,
                     255).astype(np.uint8)
    np.testing.assert_array_equal(inst["colors"], expect)
    if (out / f"{scan_id}_refer.ply").exists():
        ref = load_ply(out / f"{scan_id}_refer.ply")
        assert (ref["colors"] == [255, 0, 0]).all(axis=1).any()
