"""Portable model export via jax.export (StableHLO).

The reference exports ONNX for interchange (generate_onnx.py:6-48 with
opset 10 + optional dynamic batch + onnx.checker verify;
yolo_to_onnx.py for darknet). The TPU-native interchange format is a
serialized StableHLO module from `jax.export`: hardware-portable,
version-stable, reloadable with `deserialize` and callable from any JAX
backend. Mirrors the reference surface:

- optional dynamic batch axis (symbolic shapes <-> dynamic_axes,
  generate_onnx.py:31-36)
- post-export verification call (onnx.checker analogue :45-47)
- .onnx export is gated on the onnx package (absent in this image).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence


def export_stablehlo(fn: Callable, example_args: Sequence[Any],
                     dynamic_batch: bool = False) -> bytes:
    """Serialize `fn` (jittable) at the example shapes to StableHLO bytes."""
    import jax
    from jax import export as jex

    if dynamic_batch:
        scope = jex.SymbolicScope()
        (b,) = jex.symbolic_shape("b", scope=scope)
        shapes = []
        for a in example_args:
            shapes.append(jax.ShapeDtypeStruct((b,) + a.shape[1:], a.dtype))
        exported = jex.export(jax.jit(fn))(*shapes)
    else:
        shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                  for a in example_args]
        exported = jex.export(jax.jit(fn))(*shapes)
    return exported.serialize()


def load_stablehlo(blob: bytes):
    """Deserialize into a callable."""
    from jax import export as jex

    exported = jex.deserialize(blob)
    return exported.call


def save_exported(path: str, blob: bytes) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_exported(path: str):
    with open(path, "rb") as f:
        return load_stablehlo(f.read())


def verify_export(blob: bytes, example_args: Sequence[Any],
                  reference_fn: Optional[Callable] = None,
                  atol: float = 1e-4) -> bool:
    """Run the deserialized module on the example inputs; optionally check
    against the original function (the onnx.checker + sample-inference
    verification the reference performs after conversion)."""
    import numpy as np

    call = load_stablehlo(blob)
    out = call(*example_args)
    flat = [np.asarray(o) for o in (out if isinstance(out, (tuple, list))
                                    else [out])]
    if not all(np.all(np.isfinite(o)) for o in flat
               if np.issubdtype(o.dtype, np.floating)):
        raise ValueError("exported module produced non-finite outputs")
    if reference_fn is not None:
        want = reference_fn(*example_args)
        wflat = [np.asarray(w) for w in (want if isinstance(want,
                                                            (tuple, list))
                                         else [want])]
        for a, b in zip(flat, wflat):
            np.testing.assert_allclose(a, b, atol=atol, rtol=1e-4)
    return True
