"""Frozen end-to-end detection goldens.

The committed txts under tests/goldens/ were produced by running the
sealed mini-set engines (artifacts/engines/{yolov4-tiny,yolov5s}-mini_int8
— weights trained to convergence on the reference's bundled 10-image set)
through the full deployment pipeline: native decode -> letterbox ->
engine forward (int8 QDQ) -> in-graph decode+NMS -> ratio_pad
back-mapping -> trt_yolo.py-format rows (`name conf x1 y1 x2 y2`,
tensorrt_inference/trt_yolo.py:96-108).

Any silent drift in ANY stage changes these rows. Tolerances absorb
XLA-version fusion jitter only: boxes +-1.5px, conf +-0.015, and the
detection SET must match exactly (same count, same classes, greedy
1-1 box matching)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, needs_reference

REPO_ROOT = Path(__file__).parent.parent

IMAGES = (REFERENCE_ROOT /
          "code/victim_localization/yolov3/data/custom/test/images")
GOLDENS = Path(__file__).parent / "goldens"


def _parse(path):
    rows = []
    for ln in Path(path).read_text().splitlines():
        parts = ln.split()
        if len(parts) >= 6:
            rows.append((parts[0], float(parts[1]),
                         *[float(v) for v in parts[2:6]]))
    return rows


def _match_rows(got, want, box_tol=1.5, conf_tol=0.015):
    assert len(got) == len(want), (len(got), len(want))
    want_left = list(want)
    for g in got:
        best, best_d = None, None
        for w in want_left:
            if w[0] != g[0]:
                continue
            d = max(abs(a - b) for a, b in zip(g[2:6], w[2:6]))
            if best_d is None or d < best_d:
                best, best_d = w, d
        assert best is not None, f"no golden row for {g}"
        assert best_d <= box_tol, f"box drift {best_d:.2f}px: {g} vs {best}"
        assert abs(g[1] - best[1]) <= conf_tol, (g, best)
        want_left.remove(best)


@needs_reference
@pytest.mark.parametrize("engine,golden_dir", [
    ("yolov4-tiny-mini_int8", "v4tiny_mini_int8"),
    ("yolov5s-mini_int8", "v5s_mini_int8"),
])
def test_detection_pipeline_matches_goldens(tmp_path, engine, golden_dir):
    from rtdm_tpu.cli.yolo_detect import main

    out = str(tmp_path / "det")
    main(["--engine", str(REPO_ROOT / "artifacts/engines" / engine),
          "--source", str(IMAGES), "--output", out,
          "--save-txt", "--txt-format", "map", "--nosave"])
    gold = sorted((GOLDENS / golden_dir).glob("*.txt"))
    assert len(gold) == 10  # one per mini-set image
    for gpath in gold:
        got = _parse(os.path.join(out, gpath.name))
        _match_rows(got, _parse(gpath))
