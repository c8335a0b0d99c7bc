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
    """Return `path` if it does not exist (or exist_ok), else the first
    free `path{2,3,...}` sibling — the reference increments on MERE
    existence (an empty dir counts as taken: a concurrent run may have
    just created it and not written yet). A trailing separator is
    stripped so 'runs/train/' increments to 'runs/train2', not
    'runs/train/2'; a colliding regular FILE also bumps the suffix."""
    path = path.rstrip(os.sep) or path
    if exist_ok or not os.path.exists(path):
        return path
    n = 2
    while os.path.exists(f"{path}{n}"):
        n += 1
    return f"{path}{n}"
