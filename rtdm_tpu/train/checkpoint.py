"""Orbax checkpoint / resume.

TPU-native replacement for the reference's rich torch checkpoints
(code/disaster_detection/train.py:304-328: {epoch, model/optimizer/
scheduler/scaler state, best metrics, history, config} + best-copy logic;
resume at train.py:229-248 tolerating legacy bare state_dicts).

Stores the full TrainState pytree (params, batch_stats, opt_state, step)
plus a JSON metadata blob (epoch, best metrics, metric history, config).
`save_best_only` keeps 'best' as a separate retained checkpoint.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from rtdm_tpu.train.trainer import TrainState


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def save(self, tag: str, state: TrainState,
             metadata: Optional[Dict[str, Any]] = None) -> str:
        path = self._path(tag)
        state = jax.device_get(state)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        if metadata is not None:
            with open(os.path.join(self.directory, f"{tag}.meta.json"),
                      "w") as f:
                json.dump(_jsonify(metadata), f, indent=2)
        return path

    def restore(self, tag: str, template: TrainState
                ) -> Tuple[TrainState, Dict[str, Any]]:
        path = self._path(tag)
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          jax.device_get(template))
        state = self._ckptr.restore(path, abstract)
        meta_path = os.path.join(self.directory, f"{tag}.meta.json")
        metadata = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                metadata = json.load(f)
        return state, metadata

    def exists(self, tag: str) -> bool:
        return os.path.isdir(self._path(tag))


def _jsonify(obj):
    if isinstance(obj, dict):
        return {k: _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonify(v) for v in obj]
    if isinstance(obj, (np.generic,)):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if hasattr(obj, "item") and getattr(obj, "ndim", None) == 0:
        return obj.item()
    return obj
