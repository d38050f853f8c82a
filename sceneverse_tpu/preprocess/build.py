"""Processor base (reference preprocess/build.py:7-50): output directory
layout + config-gated outputs."""

from __future__ import annotations

from pathlib import Path

from sceneverse_tpu.registry import Registry

PROCESSOR_REGISTRY = Registry("Processor")


class ProcessorBase:
    def __init__(self, cfg):
        self.cfg = cfg
        self.data_root = Path(cfg.data_root)
        save_root = cfg.get("save_root")
        self.save_root = Path(save_root) if save_root else self.data_root.parent / "scan_data"
        self.num_workers = cfg.get("num_workers", 1)
        self.inst2label_path = self.save_root / "scan_data" / "instance_id_to_label"
        self.pcd_path = self.save_root / "scan_data" / "pcd_with_global_alignment"
        self.segm_path = self.save_root / "scan_data" / "segm"
        self.obj_path = self.save_root / "scan_data" / "obj"
        self.sp_path = self.save_root / "scan_data" / "super_points"
        self.output = cfg.output
        self.setup_directories()

    def setup_directories(self):
        if self.check_key(self.output.get("pcd")):
            self.inst2label_path.mkdir(parents=True, exist_ok=True)
            self.pcd_path.mkdir(parents=True, exist_ok=True)

    def log_starting_info(self, scan_len, e=""):
        print("=" * 50)
        print(f"Preprocessing in {type(self).__name__} with {scan_len} scans")
        kinds = [str(k) for k, v in self.output.items() if self.check_key(v)]
        assert kinds, "Please specify at least one output type"
        print(f"Output: {', '.join(kinds)}")
        if e:
            print(e)
        print("=" * 50)

    @staticmethod
    def check_key(key):
        if key is None:
            return False
        if isinstance(key, bool):
            return key
        if isinstance(key, dict):
            return key.get("enabled", True)
        return True
