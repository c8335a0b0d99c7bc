"""Small argument-sanity checks shared by the detection CLIs.

`check_img_size` mirrors the reference's guard (yolov5/utils/general.py
`check_img_size`, also yolov3/utils/utils.py `check_img_size`): every
YOLO head decodes on an integer grid of `img_size / stride` cells, so a
size that is not a multiple of the max stride (32 for every shipped cfg
and yaml) would silently mis-grid. The reference rounds UP via
`make_divisible` (math.ceil) and warns; on TPU the fix matters twice —
XLA compiles one program per static shape, so the rounded size must be
chosen BEFORE datasets and jitted steps are built.
"""

from __future__ import annotations

import math
import sys


def check_img_size(img_size: int, stride: int = 32,
                   name: str = "--img-size") -> int:
    """Return `img_size` rounded UP to the nearest multiple of `stride`,
    warning on stderr when a change was needed (general.py:247-252
    semantics: ceil, never shrink — shrinking would drop field of view)."""
    new = int(math.ceil(img_size / stride) * stride)
    if new != img_size:
        print(f"WARNING: {name} {img_size} must be a multiple of the max "
              f"stride {stride}; using {new} instead", file=sys.stderr)
    return new
