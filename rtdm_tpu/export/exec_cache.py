"""Serialized-executable engine artifacts + persistent compile cache.

The reference's TRT engines deserialize in milliseconds
(tensorrt_inference/utils/yolo_with_plugins.py:269-272 runtime.deserialize_
cuda_engine); our engines so far re-ran `jit(...).lower().compile()` on
every load (~20-60s through the TPU tunnel). This module closes that gap
two ways:

1. `save_executable`/`load_executable` — pickle the compiled XLA executable
   (jax.experimental.serialize_executable) next to the engine's params, with
   a metadata guard (platform, device kind, jax version, and a fingerprint
   of the spec+params the executable bakes in as constants). Load falls
   back to recompilation on ANY mismatch or backend refusal, so the
   artifact is an accelerator, never a correctness risk. Like a .trt file,
   the payload is device-kind-specific.

2. `enable_persistent_cache` — best-effort global XLA compilation cache
   (jax_compilation_cache_dir), so even fresh builds of a previously-seen
   program skip XLA. Opt-out via RTDM_XLA_CACHE=0; custom dir via
   RTDM_XLA_CACHE=<path>.
"""

from __future__ import annotations

import hashlib
import io
import os
import pickle
from typing import Any, Dict, Optional

_CACHE_ENABLED = False


def enable_persistent_cache() -> None:
    """Point XLA's persistent compilation cache at a durable directory.

    Idempotent and best-effort: config knobs that this jax/backend build
    does not support are simply skipped.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    _CACHE_ENABLED = True
    env = os.environ.get("RTDM_XLA_CACHE", "").strip()
    if env == "0":
        return
    cache_dir = env or os.path.join(
        os.path.expanduser("~"), ".cache", "rtdm_tpu", "xla")
    import jax
    for key, val in (("jax_compilation_cache_dir", cache_dir),
                     ("jax_persistent_cache_min_compile_time_secs", 0.0),
                     ("jax_persistent_cache_min_entry_size_bytes", 0)):
        try:
            jax.config.update(key, val)
        except Exception:
            pass


def _device_meta() -> Dict[str, str]:
    import jax
    dev = jax.devices()[0]
    return {"platform": dev.platform,
            "device_kind": getattr(dev, "device_kind", ""),
            "jax_version": jax.__version__}


def fingerprint(*parts: bytes) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(p)
        h.update(b"\x00")
    return h.hexdigest()


def fingerprint_tree(tree: Any, extra: str = "") -> str:
    """Stable content hash of a (flattened) param tree + a config string."""
    import numpy as np

    from rtdm_tpu.models.io import flatten_tree
    h = hashlib.sha256()
    flat = flatten_tree(tree) if isinstance(tree, dict) else dict(tree)
    for key in sorted(flat):
        h.update(key.encode())
        arr = np.asarray(flat[key])
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    h.update(extra.encode())
    return h.hexdigest()


def save_executable(path: str, compiled: Any, content_fingerprint: str,
                    example_args: Optional[tuple] = None) -> bool:
    """Serialize a jax.stages.Compiled to `path`. Returns False (and writes
    nothing) if this backend cannot serialize executables.

    `example_args` enables verification-at-save (the TRT builder's
    post-build test inference, build_tensorrt_model.py:262-275): the
    artifact is deserialized and executed immediately, and only written if
    its outputs match the live executable. This is load-bearing, not
    belt-and-braces — re-serializing an executable that itself came out of
    XLA's persistent compile cache produces an artifact that fails at run
    time on the CPU backend ("Buffer Definition Event ... not found"), so
    a cache-warm engine build must detect that and skip the artifact
    (loads still go fast via the persistent cache itself)."""
    import numpy as np

    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load, serialize)
        payload, in_tree, out_tree = serialize(compiled)
        try:  # single-device engine programs record n=1; be explicit so
            # load pins the device assignment instead of inheriting the
            # client's full device list (which breaks execution under a
            # multi-device client, e.g. the 8-virtual-CPU test platform)
            n_devices = len(
                compiled._executable.xla_executable.local_devices())
        except Exception:
            n_devices = 1
        if example_args is not None:
            import jax
            probe = deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=jax.devices()[:n_devices])
            got = jax.tree_util.tree_map(np.asarray, probe(*example_args))
            want = jax.tree_util.tree_map(np.asarray,
                                          compiled(*example_args))
            flat_g = jax.tree_util.tree_leaves(got)
            flat_w = jax.tree_util.tree_leaves(want)
            if len(flat_g) != len(flat_w) or not all(
                    np.allclose(g, w, rtol=1e-5, atol=1e-5, equal_nan=True)
                    for g, w in zip(flat_g, flat_w)):
                return False
        blob = {"meta": _device_meta(),
                "fingerprint": content_fingerprint,
                "n_devices": n_devices,
                "payload": payload, "in_tree": in_tree,
                "out_tree": out_tree}
        buf = io.BytesIO()
        pickle.dump(blob, buf, protocol=pickle.HIGHEST_PROTOCOL)
    except Exception:
        return False
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)
    return True


def load_executable(path: str,
                    content_fingerprint: str) -> Optional[Any]:
    """Deserialize a compiled executable if (and only if) the artifact was
    built for this platform/device-kind/jax build AND its baked-in
    spec+params fingerprint matches. Any failure -> None (caller
    recompiles)."""
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            blob = pickle.load(f)
        if blob.get("fingerprint") != content_fingerprint:
            return None
        if blob.get("meta") != _device_meta():
            return None
        from jax.experimental.serialize_executable import \
            deserialize_and_load
        import jax
        n = int(blob.get("n_devices", 1))
        devices = jax.devices()
        if n > len(devices):
            return None
        return deserialize_and_load(blob["payload"], blob["in_tree"],
                                    blob["out_tree"],
                                    execution_devices=devices[:n])
    except Exception:
        return None
