"""Run-directory helpers.

`increment_path` mirrors the reference's collision-free run dirs
(yolov5/utils/general.py `increment_path`, used as runs/exp -> exp2 ->
exp3): an existing NON-EMPTY directory is never clobbered; the next free
numeric suffix is chosen instead. Resume flows pass through unchanged —
resuming requires landing in the SAME directory.
"""

from __future__ import annotations

import os


def increment_path(path: str, exist_ok: bool = False) -> str:
    """Return `path` if free (or empty, or exist_ok), else `path{2,3,...}`."""
    if exist_ok or not os.path.exists(path) or not os.listdir(path):
        return path
    n = 2
    while os.path.exists(f"{path}{n}") and os.listdir(f"{path}{n}"):
        n += 1
    return f"{path}{n}"
