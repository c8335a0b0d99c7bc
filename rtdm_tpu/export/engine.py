"""Inference engines: AOT-compiled, quantized, serializable.

The TPU-native analogue of the reference's TensorRT pipeline:
- build_tensorrt_model.py (torch2trt fp32/fp16 engines, max batch 256,
  verification inference, saved as tensorrt_state_dicts/*_trt.pth)
- onnx_to_tensorrt.py (engine builder with INT8 calibration)

Design: an Engine is (spec JSON + params npz [+ int8 scales]) in a
directory. At load/build time the forward — device-side normalize, network,
softmax — is AOT-compiled for the fixed batch shape with
`jax.jit(...).lower().compile()`, the XLA analogue of engine building;
callers with smaller batches are zero-padded to the engine batch (TRT's
max_batch_size semantics, build_tensorrt_model.py:88). Quantization modes:
  fp32  -> float32 everywhere
  bf16  -> bfloat16 compute (the TPU's half precision; 'fp16' is accepted)
  int8  -> AQT-style w8a8 fake-quant with calibrated activation scales
           (quant/int8.py), MXU int8 path.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


@dataclasses.dataclass
class EngineSpec:
    model: str
    quant: str = "bf16"           # fp32 | bf16 (fp16 alias) | int8
    batch_size: int = 256
    image_size: int = 140
    num_classes: int = 5
    with_softmax: bool = True
    calib_method: str = "percentile"  # percentile | entropy (int8 act cal)
    version: str = "1"

    def normalized_quant(self) -> str:
        q = self.quant.lower()
        return {"fp16": "bf16", "half": "bf16"}.get(q, q)


class Engine:
    """A compiled classifier engine over uint8 NHWC frames."""

    def __init__(self, spec: EngineSpec, variables: Dict[str, Any],
                 act_scales: Optional[Dict[str, np.ndarray]] = None,
                 mesh=None, precompiled=None):
        """`mesh` (a jax.sharding.Mesh with a 'data' axis) makes this a
        MULTI-CHIP serving engine: the batch is sharded over the axis and
        GSPMD runs each shard on its own device — the inference-side
        counterpart of the data-parallel trainer (the reference has no
        analogue; TRT engines are single-GPU). The engine file format is
        unchanged — mesh is a load/build-time choice, like the chip the
        engine is compiled for.

        `precompiled` (internal, used by `load`) is a deserialized XLA
        executable for exactly this spec+params — the TRT
        deserialize_cuda_engine fast path; when given, no compilation
        happens here."""
        import jax
        import jax.numpy as jnp

        from rtdm_tpu.data.aider import normalize_batch
        from rtdm_tpu.export.exec_cache import enable_persistent_cache
        from rtdm_tpu.models import create_model

        enable_persistent_cache()
        self.spec = spec
        self.variables = variables
        self.act_scales = act_scales
        self.loaded_from_exec = precompiled is not None
        self.mesh_built = mesh is not None  # topology-bound program
        if precompiled is not None:
            self._compiled = precompiled
            return
        model = create_model(spec.model, num_classes=spec.num_classes)
        quant = spec.normalized_quant()

        if quant == "int8":
            from rtdm_tpu.quant.int8 import quantize_classifier_apply
            apply_fn = quantize_classifier_apply(
                model, variables, act_scales,
                apply_softmax=spec.with_softmax)
        else:
            from rtdm_tpu.core.precision import _cast_floating
            dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16}[quant]
            cast = _cast_floating(variables["params"], dtype)
            variables_c = {"params": cast,
                           "batch_stats": variables.get("batch_stats", {})}

            def apply_fn(u8):
                x = normalize_batch(u8).astype(dtype)
                return model.apply(variables_c, x, train=False,
                                   apply_softmax=spec.with_softmax
                                   ).astype(jnp.float32)

        b, s = spec.batch_size, spec.image_size
        jit_kwargs = {}
        if mesh is not None:
            from rtdm_tpu.core.mesh import (data_sharding,
                                            require_data_divisible)
            require_data_divisible(b, mesh, "engine batch")
            jit_kwargs = {"in_shardings": data_sharding(mesh),
                          "out_shardings": data_sharding(mesh)}
        self._compiled = (jax.jit(apply_fn, **jit_kwargs)
                          .lower(jax.ShapeDtypeStruct((b, s, s, 3),
                                                      jnp.uint8))
                          .compile())

    def dispatch(self, images_u8: np.ndarray):
        """Enqueue a batch WITHOUT materializing: returns the device output
        (padded to spec.batch_size). Slice [:n] after np.asarray. Lets a
        streaming caller double-buffer — dispatch batch k+1 while batch k
        is still computing."""
        import jax.numpy as jnp
        b = self.spec.batch_size
        n = images_u8.shape[0]
        if n > b:
            raise ValueError(f"batch {n} exceeds engine max batch {b}")
        if n < b:
            pad = np.zeros((b - n,) + images_u8.shape[1:], images_u8.dtype)
            images_u8 = np.concatenate([images_u8, pad], axis=0)
        return self._compiled(jnp.asarray(images_u8))

    def __call__(self, images_u8: np.ndarray) -> np.ndarray:
        n = images_u8.shape[0]
        return np.asarray(self.dispatch(images_u8))[:n]

    # ------------------------------------------------------------------
    def _content_fingerprint(self) -> str:
        """Hash of everything the compiled program bakes in as constants
        (spec + params + calibration scales) — guards the serialized
        executable against stale-weight reuse."""
        from rtdm_tpu.export.exec_cache import fingerprint_tree
        extra = json.dumps(dataclasses.asdict(self.spec), sort_keys=True)
        if self.act_scales:
            extra += fingerprint_tree(dict(self.act_scales))
        return fingerprint_tree(self.variables, extra=extra)

    def save(self, directory: str) -> str:
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, "spec.json"), "w") as f:
            json.dump(dataclasses.asdict(self.spec), f, indent=2)
        from rtdm_tpu.models.io import flatten_tree
        flat = flatten_tree(self.variables)
        np.savez(os.path.join(directory, "params.npz"),
                 **{k: np.asarray(v) for k, v in flat.items()})
        if self.act_scales:
            np.savez(os.path.join(directory, "act_scales.npz"),
                     **{k: np.asarray(v) for k, v in self.act_scales.items()})
        # TRT-style sealed executable: loads in ms instead of a recompile.
        # Best-effort and device-kind-bound; skipped for mesh engines
        # (device-topology-specific: load() would rehydrate an N-way
        # sharded program into a mesh=None session) and on backends that
        # can't serialize.
        if not self.loaded_from_exec and not self.mesh_built:
            from rtdm_tpu.export.exec_cache import save_executable
            b, s = self.spec.batch_size, self.spec.image_size
            save_executable(os.path.join(directory, "exec.xla"),
                            self._compiled, self._content_fingerprint(),
                            example_args=(np.zeros((b, s, s, 3), np.uint8),))
        return directory

    @classmethod
    def load(cls, directory: str, mesh=None) -> "Engine":
        with open(os.path.join(directory, "spec.json")) as f:
            spec = EngineSpec(**json.load(f))
        from rtdm_tpu.models.io import load_variables
        variables = load_variables(os.path.join(directory, "params.npz"))
        scales_path = os.path.join(directory, "act_scales.npz")
        act_scales = (dict(np.load(scales_path))
                      if os.path.exists(scales_path) else None)
        precompiled = None
        if mesh is None:  # exec artifacts are single-device programs
            from rtdm_tpu.export.exec_cache import load_executable
            probe = cls.__new__(cls)
            probe.spec, probe.variables = spec, variables
            probe.act_scales = act_scales
            precompiled = load_executable(
                os.path.join(directory, "exec.xla"),
                probe._content_fingerprint())
        return cls(spec, variables, act_scales, mesh=mesh,
                   precompiled=precompiled)


def build_engine(model_name: str, variables: Dict[str, Any],
                 quant: str = "bf16", batch_size: int = 256,
                 calib_images: Optional[np.ndarray] = None,
                 calib_method: str = "percentile",
                 verify: bool = True,
                 num_classes: Optional[int] = None) -> Engine:
    """Build (and optionally verify) an engine.

    Mirrors build_tensorrt_model.py's flow: convert -> run a test inference
    -> report shape/dtype/sample (:262-275). For int8, `calib_images`
    (uint8 NHWC) feed activation-range calibration, the
    YOLOEntropyCalibrator analogue (calibrator.py:87-153).
    `num_classes` defaults to what the checkpoint's head says.
    """
    from rtdm_tpu.models import create_model

    from rtdm_tpu.models.io import infer_num_classes
    if num_classes is None:
        num_classes = infer_num_classes(variables) or 5
    model = create_model(model_name, num_classes=num_classes)
    spec = EngineSpec(model=model_name, quant=quant, batch_size=batch_size,
                      image_size=model.image_size,
                      num_classes=num_classes,
                      calib_method=calib_method)
    act_scales = None
    if spec.normalized_quant() == "int8":
        from rtdm_tpu.quant.calibrate import calibrate_classifier
        if calib_images is None:
            raise ValueError("int8 engines need calib_images")
        act_scales = calibrate_classifier(model, variables, calib_images,
                                          method=calib_method)
    engine = Engine(spec, variables, act_scales)
    if verify:
        test = np.zeros((1, spec.image_size, spec.image_size, 3), np.uint8)
        t0 = time.time()
        out = engine(test)
        assert out.shape == (1, spec.num_classes), out.shape
        assert np.all(np.isfinite(out)), "non-finite engine output"
    return engine
