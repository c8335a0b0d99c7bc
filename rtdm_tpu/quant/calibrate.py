"""Activation-range calibration for int8 engines.

The TPU-native analogue of TRT's entropy calibrator
(tensorrt_inference/yolo/calibrator.py:87-153: stream calibration images,
collect per-tensor activation statistics, derive scales, cache to disk —
the cache here is the engine's act_scales.npz).

Observation points are the *inputs* of every Conv / DepthwiseConv / Dense
module, captured with flax's method interception — no model changes needed,
so the same calibrator serves ErNET, darknet graphs and YOLOv5.

Two reducers:
- 'percentile' (default): scale = P99.99(|x|)/127 — robust, cheap.
- 'entropy': KL-divergence-minimizing threshold over a 2048-bin histogram,
  the algorithm TRT's IInt8EntropyCalibrator2 implements.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def compute_scale(values: np.ndarray, method: str = "percentile",
                  percentile: float = 99.99, bins: int = 2048) -> float:
    """Symmetric int8 scale from observed |activation| samples."""
    absv = np.abs(values.astype(np.float32)).ravel()
    amax = float(absv.max()) if absv.size else 0.0
    if amax == 0.0:
        return 1.0
    if method == "percentile":
        t = float(np.percentile(absv, percentile))
        return max(t, amax * 1e-4) / 127.0
    if method == "entropy":
        return _entropy_threshold(absv, amax, bins) / 127.0
    raise ValueError(f"unknown calibration method '{method}'")


def _entropy_threshold(absv: np.ndarray, amax: float, bins: int) -> float:
    """KL-minimizing saturation threshold (TRT-style, 128-bin target)."""
    hist, edges = np.histogram(absv, bins=bins, range=(0, amax))
    hist = hist.astype(np.float64)
    best_t, best_kl = amax, np.inf
    # candidate thresholds from 128 bins upward
    for i in range(128, bins + 1, 8):
        p = hist[:i].copy()
        p[i - 1] += hist[i:].sum()  # clip outliers into the last bin
        if p.sum() == 0:
            continue
        # quantize the CLIPPED i-bin distribution down to 128 levels —
        # p (not the raw hist): its last bin carries the folded outlier
        # mass, and q must see that mass too or heavy-tailed activations
        # inflate KL for small thresholds and bias best_t large
        factor = i / 128.0
        q = np.zeros(i)
        for j in range(128):
            lo = int(j * factor)
            hi = max(int((j + 1) * factor), lo + 1)
            chunk = p[lo:hi]
            nz = chunk > 0
            if nz.any():
                q[lo:hi][nz] = chunk[nz].sum() / nz.sum()
        pn, qn = p / p.sum(), q / max(q.sum(), 1e-12)
        mask = pn > 0
        kl = float(np.sum(pn[mask] * np.log(pn[mask] /
                                            np.maximum(qn[mask], 1e-12))))
        if kl < best_kl:
            best_kl, best_t = kl, edges[i]
    return best_t


def calibrate_model(model, variables: Dict[str, Any],
                    calib_images_u8: np.ndarray,
                    preprocess,
                    method: str = "percentile",
                    batch_size: int = 64,
                    sample_cap: int = 1 << 20) -> Dict[str, np.ndarray]:
    """Run calibration batches through `preprocess` + the model, return
    {module_path: scale} for all Conv/DepthwiseConv/Dense inputs. Serves
    classifiers (normalize_batch) and detectors (u8/255) alike."""
    import jax.numpy as jnp
    from flax import linen as nn

    from rtdm_tpu.models.layers import Conv, Dense, DepthwiseConv

    samples: Dict[str, list] = {}

    def interceptor(next_fun, args, kwargs, context):
        if (isinstance(context.module, (Conv, DepthwiseConv, Dense))
                and context.method_name == "__call__"):
            path = "/".join(context.module.path)
            x = np.asarray(args[0], np.float32).ravel()
            if x.size > sample_cap // 8:
                x = x[:: max(x.size // (sample_cap // 8), 1)]
            samples.setdefault(path, []).append(np.abs(x))
        return next_fun(*args, **kwargs)

    n = calib_images_u8.shape[0]
    for start in range(0, n, batch_size):
        batch = jnp.asarray(calib_images_u8[start:start + batch_size])
        x = preprocess(batch)
        with nn.intercept_methods(interceptor):
            model.apply({"params": variables["params"],
                         "batch_stats": variables.get("batch_stats", {})},
                        x, train=False)

    return {path: np.float32(compute_scale(np.concatenate(vals), method))
            for path, vals in samples.items()}


def calibrate_classifier(model, variables: Dict[str, Any],
                         calib_images_u8: np.ndarray,
                         method: str = "percentile",
                         batch_size: int = 64,
                         sample_cap: int = 1 << 20) -> Dict[str, np.ndarray]:
    """Classifier calibration: uint8 frames through the AIDER normalize."""
    from rtdm_tpu.data.aider import normalize_batch

    return calibrate_model(model, variables, calib_images_u8,
                           normalize_batch, method, batch_size, sample_cap)


def calibrate_detector(model, variables: Dict[str, Any],
                       calib_images_u8: np.ndarray,
                       method: str = "percentile",
                       batch_size: int = 16,
                       sample_cap: int = 1 << 20) -> Dict[str, np.ndarray]:
    """Detector calibration: letterboxed uint8 frames through the /255
    preprocessing (the YOLOEntropyCalibrator's _preprocess_yolo analogue,
    calibrator.py:67-84)."""
    import jax.numpy as jnp

    return calibrate_model(model, variables, calib_images_u8,
                           lambda u8: u8.astype(jnp.float32) / 255.0,
                           method, batch_size, sample_cap)
