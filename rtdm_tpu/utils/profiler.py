"""Timing / FPS / energy instrumentation.

TPU-native replacements for the reference's profiling toolkit:
- `StepTimer` — sync-bracketed step timing (time_synchronized analogue,
  yolov3/utils/torch_utils.py:47; forces materialization since
  block_until_ready is insufficient over remote transports).
- `FpsMeter` — EMA-smoothed FPS (trt_yolo.py:118-121,
  real-time-inference.py:194-198).
- `PowerMonitor` — energy-per-frame estimation. The reference reads the
  Jetson TX2's INA3221 i2c rails (calculate-power-usage.py:26-39,
  105-213); TPUs expose no per-chip power sysfs here, so energy is
  modelled as busy-time x chip TDP (configurable W) with trapezoidal
  integration over the sampled duty cycle, and the same
  getTotalEnergy/energy-per-frame reporting surface.
- `trace` — context manager around jax.profiler for on-demand XLA traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Any, List, Optional

import numpy as np

# Rough board powers for energy modelling (W). The TX2 numbers in the
# reference are measured; ours is a proxy until per-chip telemetry exists.
DEFAULT_CHIP_WATTS = {"tpu-v5e": 170.0, "tpu-v4": 192.0, "cpu": 65.0}


class StepTimer:
    """Sync-bracketed wall-clock timer for device work.

    History is a bounded deque: live-stream loops tick this every frame,
    and an unbounded list would grow for the life of a surveillance run.
    """

    def __init__(self, max_records: int = 65536):
        import collections
        self.times = collections.deque(maxlen=max_records)
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result: Any = None) -> float:
        if result is not None:
            np.asarray(result)  # force full materialization
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        # skip the first (compile) step when enough samples exist
        ts = list(self.times)
        ts = ts[1:] if len(ts) > 1 else ts
        return float(np.mean(ts)) if ts else 0.0

    @property
    def total(self) -> float:
        return float(np.sum(self.times))


class FpsMeter:
    """EMA-smoothed frames/s."""

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.fps = 0.0
        self._last: Optional[float] = None
        self.frames = 0

    def tick(self, n_frames: int = 1) -> float:
        now = time.perf_counter()
        if self._last is not None:
            inst = n_frames / max(now - self._last, 1e-9)
            self.fps = (inst if self.fps == 0.0
                        else self.decay * self.fps + (1 - self.decay) * inst)
        self._last = now
        self.frames += n_frames
        return self.fps


@dataclass
class PowerSample:
    t: float
    watts: float


class PowerMonitor:
    """Busy-time energy model with the PowerLogger reporting surface."""

    def __init__(self, chip_watts: Optional[float] = None,
                 idle_watts: float = 30.0):
        import jax
        if chip_watts is None:
            kind = jax.devices()[0].device_kind.lower()
            chip_watts = next((w for k, w in DEFAULT_CHIP_WATTS.items()
                               if k.split("-")[-1] in kind),
                              DEFAULT_CHIP_WATTS["tpu-v5e"])
        self.chip_watts = float(chip_watts)
        self.idle_watts = float(idle_watts)
        self.samples: List[PowerSample] = []
        self._events: List[tuple] = []
        self._t_start: Optional[float] = None
        self._busy = 0.0

    def start(self) -> None:
        self._t_start = time.perf_counter()
        self.samples.append(PowerSample(0.0, self.idle_watts))

    def record_busy(self, seconds: float) -> None:
        """Log a span of device-busy time (one inference step)."""
        t = time.perf_counter() - self._t_start
        self._busy += seconds
        self.samples.append(PowerSample(t - seconds, self.chip_watts))
        self.samples.append(PowerSample(t, self.idle_watts))

    def mark_event(self, name: str) -> None:
        self._events.append((time.perf_counter() - self._t_start, name))

    def stop(self) -> None:
        self.samples.append(PowerSample(time.perf_counter() - self._t_start,
                                        self.idle_watts))

    def get_total_energy(self) -> float:
        """Joules over the modelled step trace (same reporting surface as
        calculate-power-usage.py getTotalEnergy:200-208, which trapezoids
        REAL sensor samples). Ours is an idle/busy STEP model — each
        sample's wattage holds until the next sample (the where='post'
        plot) — so the integral is sum(w[i] * dt[i]), not a trapezoid:
        a trapezoid would ramp idle->busy linearly over every host-side
        gap and overcount it at the (idle+busy)/2 average."""
        if len(self.samples) < 2:
            return 0.0
        t = np.array([s.t for s in self.samples])
        w = np.array([s.watts for s in self.samples])
        return float(np.sum(w[:-1] * np.diff(t)))

    def energy_per_frame(self, frames: int) -> float:
        """mJ per frame over the busy spans only."""
        if frames <= 0:
            return 0.0
        return self._busy * self.chip_watts / frames * 1e3

    def plot(self, path: str) -> str:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 3.5))
        ax.step([s.t for s in self.samples],
                [s.watts for s in self.samples], where="post")
        for t, name in self._events:
            ax.axvline(t, ls="--", alpha=0.4)
            ax.text(t, ax.get_ylim()[1] * 0.95, name, rotation=90,
                    fontsize=7, va="top")
        ax.set_xlabel("s")
        ax.set_ylabel("W (modelled)")
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return path


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
