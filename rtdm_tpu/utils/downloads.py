"""Weight auto-download convenience (reference parity, offline-gated).

The reference resolves missing weight files by fetching them from its
published Google-Drive mirrors before loading
(yolov3/models.py:553-572 `attempt_download`; yolov5 uses the same
mechanism via utils/google_utils.py). This environment has no egress,
so the TPU build keeps the *surface*: known names resolve against local
search paths first; when the file is genuinely absent the error names
the known mirror instead of failing with a bare FileNotFoundError, and
a fetch is attempted only when RTDM_ALLOW_DOWNLOAD=1 (so an online
deployment gets the reference behavior unchanged).
"""

from __future__ import annotations

import os
from typing import Optional

# the reference's published weight mirrors (yolov3/models.py:555-560,
# weights/download_yolov3_weights.sh) — name -> (gdrive id | url)
KNOWN_WEIGHTS = {
    "yolov3.weights": "https://pjreddie.com/media/files/yolov3.weights",
    "yolov3-tiny.weights":
        "https://pjreddie.com/media/files/yolov3-tiny.weights",
    "yolov3-spp.weights":
        "https://pjreddie.com/media/files/yolov3-spp.weights",
    "darknet53.conv.74":
        "https://pjreddie.com/media/files/darknet53.conv.74",
    "yolov3.pt": "gdrive:1SHNFyoe5Ni8DajDNEqgB2oVKBb_NoEad",
    "yolov3-spp.pt": "gdrive:1f6Ovy3BSq2wYq4UfvFUpxJFNDFfrIDcR",
    "yolov3-tiny.pt": "gdrive:1-GWwTxFEBZdzxXnGQ1AdCdh-VGsERCgJ",
}

SEARCH_PATHS = (
    ".", "weights",
    "/root/reference/code/victim_localization/yolov3/weights",
    "/root/reference/code/disaster_detection/weights",
)


def attempt_download(weights: Optional[str]) -> Optional[str]:
    """Resolve a weights path the way the reference does: return it if it
    exists, search the conventional weight dirs for the basename, else —
    for known names — attempt the published-mirror fetch (only with
    RTDM_ALLOW_DOWNLOAD=1; this box has zero egress) and otherwise raise
    an error that names the mirror."""
    if not weights:
        return weights
    if os.path.exists(weights):
        return weights
    name = os.path.basename(weights)
    for root in SEARCH_PATHS:
        cand = os.path.join(root, name)
        if os.path.exists(cand):
            return cand
    src = KNOWN_WEIGHTS.get(name)
    if src is None:
        return weights  # unknown name: let the loader raise its own error
    if os.environ.get("RTDM_ALLOW_DOWNLOAD") == "1":
        import urllib.request
        if src.startswith("gdrive:"):
            url = ("https://drive.google.com/uc?export=download&id="
                   + src.split(":", 1)[1])
        else:
            url = src
        os.makedirs(os.path.dirname(weights) or ".", exist_ok=True)
        urllib.request.urlretrieve(url, weights)  # noqa: S310 — known host
        return weights
    raise FileNotFoundError(
        f"{weights} not found locally; the reference auto-downloads it "
        f"from {src} (yolov3/models.py:553-572). Set "
        "RTDM_ALLOW_DOWNLOAD=1 on a host with network access, or place "
        f"the file in one of {SEARCH_PATHS}.")
