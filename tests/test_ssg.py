"""Scene-graph generation tests over the synthetic fixture tree."""

import json

import numpy as np
import pytest

from sceneverse_tpu.data.fixture import write_synthetic_tree
from sceneverse_tpu.preprocess.ssg.objnode import ObjNode, in_rect, rect_area
from sceneverse_tpu.preprocess.ssg.relationships import (
    cal_support_relations,
    find_aligned_furniture,
    get_direction,
    get_oppo_direction,
)
from sceneverse_tpu.preprocess.ssg.ssg_main import build_scene_graph, generate_ssg


def test_support_detected_for_stacked_objects():
    # positions are scene-centered (the support heuristics assume z straddles
    # zero, reference support.py:28 "floating" check)
    table = ObjNode(id=1, label="table", position=[0, 0, -0.5], size=[2, 2, 1])
    cup = ObjNode(id=2, label="cup", position=[0.2, 0.1, 0.1], size=[0.2, 0.2, 0.2])
    rels, embedded, supported = cal_support_relations({1: table, 2: cup})
    assert supported == {2: 1}
    assert len(rels) == 1
    src, tgt, phrase = rels[0]
    assert (src, tgt) == (1, 2)
    assert isinstance(phrase, str) and phrase


def test_direction_clock_semantics():
    assert get_direction((0, 0), (0, 1)) == "12"
    assert get_direction((0, 0), (1, 0)) == "3"
    assert get_direction((0, 0), (0, -1)) == "6"
    assert get_direction((0, 0), (-1, 0)) == "9"
    assert get_oppo_direction("3") == "to the left of"
    assert get_oppo_direction("9") == "to the right of"
    assert get_oppo_direction("12") == "behind"
    assert get_oppo_direction("6") == "in front of"


def test_aligned_furniture_grouping():
    nodes = {
        i: ObjNode(id=i, label="chair", position=[0, float(i), 0.5], size=[1, 1, 1])
        for i in range(3)
    }
    nodes[3] = ObjNode(id=3, label="sofa", position=[5, 9, 0.5], size=[3, 1, 1])
    groups = find_aligned_furniture(list(nodes), nodes, 0.065)
    aligned_sets = [set(g[:-1]) for g in groups]
    assert {0, 1, 2} in aligned_sets


def test_rect_helpers():
    r = np.array([[0, 0, 1], [2, 0, 1], [2, 2, 1], [0, 2, 1]], float)
    assert rect_area(r[:, :2]) == 4.0
    assert in_rect(r, (1, 1))
    assert not in_rect(r, (3, 1))


def test_generate_ssg_end_to_end(tmp_path):
    root = write_synthetic_tree(tmp_path, n_scans=2)
    rels, objs = generate_ssg(root / "scan_data", tmp_path / "ssg")
    assert (tmp_path / "ssg/relationships.json").exists()
    assert (tmp_path / "ssg/objects.json").exists()
    data = json.load((tmp_path / "ssg/relationships.json").open())
    assert len(data) == 2
    for scan_id, entry in data.items():
        assert isinstance(entry["relationships"], list)
        # every scene gets at least floor-support or hanging relations
        assert len(entry["relationships"]) > 0


def test_camera_relations():
    """reference camera.py:34-70 semantics (dead code there — never imported;
    implemented for surface completeness): FOV front/behind, left/right by
    the camera sight line, and center/corner global positions for
    multi-instance labels."""
    from sceneverse_tpu.preprocess.ssg.objnode import ObjNode
    from sceneverse_tpu.preprocess.ssg.relationships import (
        cal_camera_relations,
        cal_global_position,
    )

    # camera at origin looking along -y (ssg_main.init_camera_view)
    cam_pos, cam_view = [0.0, 0.0, 0.0], [0.0, -1.0, 0.0]
    nodes = {
        "0": ObjNode("0", "floor", [0, 0, 0], [10, 10, 0.1]),
        "1": ObjNode("1", "chair", [0, -3, 0.5], [1, 1, 1]),   # in front
        "2": ObjNode("2", "chair", [0, 3, 0.5], [1, 1, 1]),    # behind
        "3": ObjNode("3", "table", [-3, 0.2, 0.5], [1, 1, 1]),  # side
    }
    inst = {"chair": 2, "table": 1, "floor": 1}
    rels = cal_camera_relations(nodes, cam_pos, cam_view, inst, "0")
    bykey = {(s, t): r for s, t, r in rels}
    assert bykey[("-1", "1")] == "in front of"
    assert bykey[("-1", "2")] == "behind"
    assert bykey[("-1", "3")] in ("left", "right")
    # chair at distance 3 from center with rate 1.6: neither center nor corner
    assert ("1", "1") not in bykey
    # global position directly: center hit
    assert cal_global_position(nodes["1"], nodes["0"], distance_rate=4.0) == \
        "in the center"


def test_ssg_visualize_renders_pngs(tmp_path):
    """matplotlib analog of the reference's open3d ssg_visualize (open3d not
    in image): one PNG per relation, incl. the rel[1]==-2 single-object
    case."""
    from sceneverse_tpu.preprocess.ssg.objnode import ObjNode
    from sceneverse_tpu.preprocess.ssg.visualize import vis_dataset

    root = write_synthetic_tree(tmp_path, n_scans=1)
    scan = next((root / "scan_data/pcd_with_global_alignment").glob("*.pth")).stem
    nodes = {
        "1": ObjNode("1", "chair", [0, 0, 0.5], [1, 1, 1]),
        "2": ObjNode("2", "table", [1.5, 0, 0.5], [1, 1, 1]),
    }
    rels = [["1", "2", "close to"], ["1", -2, "in the center"], ["bad"]]
    out = vis_dataset(nodes, rels, root / "scan_data", scan,
                      tmp_path / "vis", limit=8)
    assert len(out) == 2 and all(p.exists() and p.stat().st_size > 0 for p in out)
