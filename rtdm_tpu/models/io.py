"""Unified weight loading/saving for inference CLIs.

Accepts either a reference torch .pt state_dict (imported via
models/torch_import.py) or this framework's own .npz weight archives
(flat 'path/to/leaf' -> array, written after training — the analogue of the
reference saving {model}.pt, train.py:304-328).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_variables(path: str, variables: Dict[str, Any]) -> str:
    """Write {'params': ..., 'batch_stats': ...} as a flat .npz."""
    if not path.endswith(".npz"):
        path += ".npz"
    np.savez(path, **flatten_tree(variables))
    return path


def load_variables(path: str) -> Dict[str, Any]:
    """Load classifier variables from .pt (torch) or .npz (ours)."""
    if path.endswith(".pt") or path.endswith(".pth"):
        from rtdm_tpu.models.torch_import import load_classifier_checkpoint
        return load_classifier_checkpoint(path)
    flat = dict(np.load(path))
    # sealed archives store int8 weight codes + per-channel scales
    # ('<leaf>.q' int8 / '<leaf>.s' fp32, export/detector.py save_detector
    # sealed=True); dequantize transparently — q*s IS the QDQ'd kernel.
    for key in [k for k in flat if k.endswith(".q")]:
        base = key[:-2]
        scale = flat.pop(base + ".s")
        flat[base] = flat.pop(key).astype(np.float32) * scale
    tree = unflatten_tree(flat)
    tree.setdefault("batch_stats", {})
    return tree


def infer_num_classes(variables) -> "int | None":
    """Class count from a classifier checkpoint: every classifier here ends
    in a Dense head named 'fc' (ernet.py _ErnetHead), so its kernel's last
    dim IS num_classes. None when no fc head is found."""
    for key, val in flatten_tree(variables).items():
        if key.endswith("fc/kernel"):
            return int(np.shape(val)[-1])
    return None
