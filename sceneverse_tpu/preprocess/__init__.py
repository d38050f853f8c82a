"""Offline scene preprocessing (reference preprocess/*): raw dataset releases
-> the scan_data/{pcd_with_global_alignment,instance_id_to_label} layout the
data layer consumes. Pure numpy/scipy batch jobs (the reference used
trimesh/open3d, unavailable here; PLY parsing is native)."""

from sceneverse_tpu.preprocess.build import PROCESSOR_REGISTRY, ProcessorBase  # noqa: F401
