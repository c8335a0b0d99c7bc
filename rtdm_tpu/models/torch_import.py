"""Import reference torch checkpoints into rtdm_tpu parameter trees.

Handles the classifier family's state_dicts (reference artifacts under
code/disaster_detection/weights/*, e.g. squeeze-ernet-state_dict.pt) and the
rich trainer checkpoints ({'model_state_dict': ...}, train.py:310-320).

Layout conversion (the part that is easy to get wrong):
- torch Conv2d weight  (O, I/g, kH, kW)  ->  HWIO (kH, kW, I/g, O)
- depthwise (groups=C) (C, 1, kH, kW)    ->  (kH, kW, 1, C)
- torch Linear weight  (out, in)         ->  (in, out)
- BatchNorm weight/bias/running_mean/running_var -> scale/bias + batch_stats
The fc layer needs no row permutation because our models flatten in torch's
channel-major order (models/ernet.py:_nchw_flatten).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _install_stub_module(name: str) -> None:
    """Register a stub module whose attribute lookups synthesize empty
    nn.Module subclasses. Full-module pickles (the legacy checkpoints the
    reference loads at aider-predict.py:36-41) reference training-repo
    classes like `model.ernet.ErNET`; unpickling only needs the class
    object to exist — state is restored straight into __dict__ — so a stub
    lets us read them without importing the reference's code."""
    import sys
    import types

    import torch.nn as nn

    mod = types.ModuleType(name)
    mod.__path__ = []  # mark as package so submodule imports raise
    #                    ModuleNotFoundError (and get stubbed in turn)

    def _getattr(cls_name: str):
        if cls_name.startswith("__"):
            raise AttributeError(cls_name)
        cls = type(cls_name, (nn.Module,), {})
        setattr(mod, cls_name, cls)
        return cls

    mod.__getattr__ = _getattr
    sys.modules[name] = mod


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt file into {key: float32 ndarray} without needing CUDA."""
    import torch  # CPU torch, used only as a pickle reader at import time

    for _ in range(16):  # one retry per missing pickled module path
        try:
            obj = torch.load(path, map_location="cpu", weights_only=False)
            break
        except ModuleNotFoundError as e:
            _install_stub_module(e.name)
    else:
        raise ValueError(f"could not unpickle {path}")
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if (isinstance(obj, dict) and "model" in obj
            and not hasattr(obj["model"], "detach")):
        # yolov3-fork / yolov5 trainer checkpoints: {'model':
        # state_dict|module} — but NOT a state_dict whose 'model' key is
        # itself a tensor, which must stay at this level
        obj = obj["model"]
    if hasattr(obj, "state_dict"):  # a pickled full module
        obj = obj.state_dict()
    if not isinstance(obj, Mapping):
        raise ValueError(f"unsupported checkpoint format in {path}")
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0)).astype(np.float32)


def _split_key(key: str) -> Tuple[str, ...]:
    return tuple(key.split("."))


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# torch modules that live inside the head module in our linen models.
_HEAD_MODULES = {"conv2", "fc"}


def classifier_variables_from_torch(state_dict: Mapping[str, np.ndarray]
                                    ) -> Dict[str, Any]:
    """Build {'params': ..., 'batch_stats': ...} for the ErNET family."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for key, val in state_dict.items():
        parts = _split_key(key)
        module_path, leaf = parts[:-1], parts[-1]
        if module_path and module_path[0] in _HEAD_MODULES:
            module_path = ("head",) + module_path
        if leaf == "num_batches_tracked":
            continue
        if leaf == "weight":
            if val.ndim == 4:
                _set(params, module_path + ("kernel",), _conv_kernel(val))
            elif val.ndim == 2:
                _set(params, module_path + ("kernel",),
                     np.transpose(val).astype(np.float32))
            elif val.ndim == 1:  # batch-norm gamma
                _set(params, module_path + ("scale",), val.astype(np.float32))
            else:
                raise ValueError(f"unexpected weight rank for {key}: {val.shape}")
        elif leaf == "bias":
            _set(params, module_path + ("bias",), val.astype(np.float32))
        elif leaf == "running_mean":
            _set(stats, module_path + ("mean",), val.astype(np.float32))
        elif leaf == "running_var":
            _set(stats, module_path + ("var",), val.astype(np.float32))
        else:
            raise ValueError(f"unhandled key {key}")
    return {"params": params, "batch_stats": stats}


def infer_classifier_arch(state_dict: Mapping[str, np.ndarray]) -> str:
    """Architecture from checkpoint keys: conv_red* -> squeeze-redconv,
    acff5/6 -> ernet, else squeeze-ernet. Lets the legacy full-module
    pickles (Squeeze97.pt, ernet.pt, ...) self-identify."""
    keys = set()
    for k in state_dict:
        keys.add(k.split(".")[0])
    if any(k.startswith("conv_red") for k in keys):
        return "squeeze-redconv"
    if "acff5" in keys or "acff6" in keys:
        return "ernet"
    return "squeeze-ernet"


def load_classifier_checkpoint(path: str) -> Dict[str, Any]:
    return classifier_variables_from_torch(load_torch_state_dict(path))
