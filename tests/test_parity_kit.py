"""PARITY_KIT.md executable rehearsal: the exact command surface that will
reproduce reference metrics from released checkpoints (convert ->
SCENEVERSE_FUSED_MHA=off exact mode -> mode=test eval) runs end to end on a
fixture checkpoint + fixture SceneVerse tree TODAY. Matches
/root/reference/TRAIN.md:61-83 ("Directly testing the checkpoint" with
pretrain_ckpt_path) — the dims are shrunk via CLI overrides (the same
mechanism a real run would not need), everything else is the kit's command
list verbatim.
"""

from __future__ import annotations

import json
from pathlib import Path

import torch

# the full reference-named torch GPS tree (same module as the conversion
# coverage test; pytest puts tests/ on sys.path)
from test_convert_fulltree import FF, HEADS, HID, LAYERS, TorchGPS

from sceneverse_tpu.data.fixture import write_synthetic_tree


def test_parity_kit_commands_on_fixture(tmp_path, monkeypatch):
    data_root = tmp_path / "sv"
    write_synthetic_tree(data_root)
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    torch.manual_seed(0)
    torch.save(TorchGPS().state_dict(), ckpt_dir / "pytorch_model.bin")

    # PARITY_KIT.md step 1: bit-exact kernel mode
    monkeypatch.setenv("SCENEVERSE_FUSED_MHA", "off")
    monkeypatch.delenv("SCENEVERSE_PALLAS_FAST", raising=False)
    monkeypatch.setenv("SCENEVERSE_CAP_CLS_ONLY", "off")

    import run

    # PARITY_KIT.md step 2 (ScanRefer), with dims shrunk to the fixture
    # checkpoint's (HID/HEADS/FF/LAYERS from the torch tree above)
    results = run.main([
        "--config-path", "configs/final/finetune",
        "--config-name", "scanrefer_finetune.yaml",
        "mode=test",
        "eval.save=True",  # persist per-item results.json
        f"pretrain_ckpt_path={ckpt_dir}",
        f"data.scan_family_base={data_root}",
        "data.args.pc_type=gt",  # fixture ships GT segments, no Mask3D
        "data.args.max_obj_len=8",
        "data.args.num_points=64",
        "dataloader.batchsize=2", "dataloader.num_workers=0",
        "num_gpu=1",
        f"base_dir={tmp_path / 'out'}",
        "debug.flag=True", "debug.debug_size=4",
        f"model.language.args.hidden_size={HID}",
        f"model.language.args.num_hidden_layers={LAYERS}",
        f"model.language.args.num_attention_heads={HEADS}",
        f"model.vision.args.hidden_size={HID}",
        f"model.vision.args.num_layers={LAYERS}",
        f"model.vision.args.num_attention_heads={HEADS}",
        f"model.vision.args.dim_feedforward={FF}",
        f"model.grounding.args.hidden_size={HID}",
        f"model.grounding.args.num_layers={LAYERS}",
        f"model.grounding.args.num_attention_heads={HEADS}",
        f"model.grounding.args.dim_feedforward={FF}",
        f"model.heads.ground_head.args.input_size={HID}",
        f"model.heads.ground_head.args.hidden_size={HID}",
    ])

    # ScanReferEval's metric dict (reference evaluator/scanrefer_eval.py:
    # 43-48): target + iou25/iou50 splits
    assert "og_acc_iou25" in results and "og_acc_iou50" in results
    # per-item results.json persisted under eval_results/ (eval.save=True —
    # the artifact detailed analyses are read from)
    out_dirs = list((tmp_path / "out").glob("**/results.json"))
    assert out_dirs, "results.json not written"
    saved = json.loads(Path(out_dirs[0]).read_text())
    assert isinstance(saved, list) and saved, "per-item results empty"
