"""Data pipeline. Importing populates DATASET/DATASETWRAPPER registries."""

from sceneverse_tpu.data.build import (  # noqa: F401
    DATASET_REGISTRY,
    build_dataloader,
    get_dataset,
)
from sceneverse_tpu.data.datasets import synthetic as _synthetic  # noqa: F401
from sceneverse_tpu.data.datasets import families as _families  # noqa: F401
from sceneverse_tpu.data.datasets import scannet_qa as _scannet_qa  # noqa: F401
