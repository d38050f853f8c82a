"""Data-pipeline debug trainer (reference trainer/debug_trainer.py:9-70):
iterates the dataloaders without running the model."""

from __future__ import annotations

from tqdm import tqdm

from sceneverse_tpu.trainer.build import TRAINER_REGISTRY, BaseTrainer


@TRAINER_REGISTRY.register()
class DebugTrainer(BaseTrainer):
    def run(self):
        for split, loader in self.data_loaders.items():
            loaders = loader if isinstance(loader, list) else [loader]
            for li, sub in enumerate(loaders):
                for _ in tqdm(sub, desc=f"debug iterate {split}[{li}]"):
                    pass
        print("DebugTrainer: all dataloaders iterated")
