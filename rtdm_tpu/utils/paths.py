"""Run-directory helpers.

`increment_path` mirrors the reference's collision-free run dirs
(yolov5/utils/general.py `increment_path`, used as runs/exp -> exp2 ->
exp3): an existing NON-EMPTY directory is never clobbered; the next free
numeric suffix is chosen instead. Resume flows pass through unchanged —
resuming requires landing in the SAME directory.
"""

from __future__ import annotations

import os


def _occupied(path: str) -> bool:
    """True when `path` exists as a file, or as a non-empty directory."""
    if not os.path.exists(path):
        return False
    return not os.path.isdir(path) or bool(os.listdir(path))


def increment_path(path: str, exist_ok: bool = False) -> str:
    """Return `path` if free (or an empty dir, or exist_ok), else the
    first free `path{2,3,...}` sibling. A trailing separator is stripped
    so 'runs/train/' increments to 'runs/train2', not 'runs/train/2';
    a colliding regular FILE counts as occupied rather than crashing."""
    path = path.rstrip(os.sep) or path
    if exist_ok or not _occupied(path):
        return path
    n = 2
    while _occupied(f"{path}{n}"):
        n += 1
    return f"{path}{n}"
