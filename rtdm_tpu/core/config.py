"""Unified typed training configuration.

Covers the reference's classifier TrainingConfig surface
(code/disaster_detection/training_utils/config.py:10-106 — ~40 knobs,
image-size inference from model name, batch doubling for squeeze models,
JSON dump) plus TPU-specific fields (precision policy, mesh shape).
The darknet-cfg and yolov5-yaml model DSLs are ingested by the model
builders (models/darknet.py, models/yolov5.py); this config is the
single runtime-knob tree for the unified trainer.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class TrainingConfig:
    # Model
    model: str = "squeeze-ernet"
    pretrained: bool = False
    resume: bool = False
    weights: Optional[str] = None
    loss: str = "label_smoothing_ce"
    num_classes: int = 5

    # Data
    root_dir: str = "data/AIDER"
    train_split: str = "dataloaders/aider_train.csv"
    val_split: str = "dataloaders/aider_val.csv"
    test_split: str = "dataloaders/aider_test.csv"
    image_size: Optional[int] = None  # None -> inferred from the model
    augment: bool = True
    use_albumentations: bool = True   # False -> torchvision-style augs
    num_workers: int = 8

    # Optimisation
    batch_size: int = 32
    epochs: int = 200
    optimizer: str = "adamw"
    lr: float = 3e-4
    min_lr: float = 1e-6
    weight_decay: float = 0.01
    momentum: float = 0.9
    label_smoothing: float = 0.1
    focal_gamma: float = 2.0
    grad_clip: float = 1.0
    grad_accum_steps: int = 2
    scheduler: str = "onecycle"
    warmup_epochs: int = 5
    warmup_ratio: float = 0.1
    mixup_alpha: float = 0.2
    cutmix_alpha: float = 0.1
    dropout: float = 0.2

    # Precision / parallelism (TPU-native replacements for use_amp/device)
    precision: str = "bf16"          # 'bf16' | 'fp32'
    mesh_shape: Tuple[int, ...] = ()  # () -> 1-D data mesh over all devices
    sync_batchnorm: bool = True       # free under GSPMD: global batch stats

    # Checkpointing
    checkpoint_dir: str = "saves"
    checkpoint_freq: int = 1
    save_best_only: bool = True

    # Early stopping
    early_stopping: bool = True
    patience: int = 20

    # Misc
    seed: int = 42
    debug: bool = False
    log_dir: str = "logs"

    # marker so the squeeze batch-doubling happens exactly once (the
    # reference re-doubles on every __post_init__, which makes
    # dataclasses.replace() a footgun)
    batch_doubled: bool = False

    def __post_init__(self):
        # Reference semantics: ernet -> 240 input, squeeze variants -> 140
        # with doubled batch (config.py:85-94). Unlike the reference, an
        # EXPLICIT image_size is respected, the model-name check is
        # case-insensitive (models/__init__ lowercases), and the doubling
        # is idempotent across replace()/load().
        if self.image_size is None:
            self.image_size = 240 if self.model.lower() == "ernet" else 140
        if self.model.lower() != "ernet" and not self.batch_doubled:
            self.batch_size *= 2
            self.batch_doubled = True
        if self.weights is None:
            self.weights = os.path.join(self.checkpoint_dir, f"{self.model}.npz")

    def save(self, path: Optional[str] = None) -> str:
        path = path or os.path.join(self.log_dir, "config.json")
        if os.path.dirname(path):  # bare filename: makedirs('') raises
            os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=4)
        return path

    @classmethod
    def load(cls, path: str) -> "TrainingConfig":
        with open(path) as f:
            raw = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        filtered = {k: v for k, v in raw.items() if k in known}
        # Undo __post_init__'s batch doubling so a saved config round-trips.
        cfg = cls.__new__(cls)
        for f_ in dataclasses.fields(cls):
            setattr(cfg, f_.name, filtered.get(f_.name, f_.default))
        if isinstance(cfg.mesh_shape, list):
            cfg.mesh_shape = tuple(cfg.mesh_shape)
        return cfg
