"""Concurrent-client load test for the rtdm-serve HTTP front end.

Measures what a deployment actually cares about and the reference never
quantified (its loops are single-client local display,
real-time-inference.py:179-208): client-observed p50/p99 latency, steady
RPS, and how well the micro-batcher fills the engine batch under its
deadline (/stats mean_batch vs engine batch).

Usage (against a running `python -m rtdm_tpu.cli.serve ...`):
  python -m rtdm_tpu.cli.serve_loadtest --url http://127.0.0.1:8000 \
      --endpoint /v1/classify --clients 32 --requests 64
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
import urllib.request
from typing import Dict, List

import numpy as np


def _jpeg(rng: np.random.Generator, h: int = 240, w: int = 320) -> bytes:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                    ).save(buf, format="JPEG", quality=85)
    return buf.getvalue()


def run_load(url: str, endpoint: str = "/v1/classify", clients: int = 16,
             requests_per_client: int = 32, timeout: float = 60.0,
             seed: int = 0) -> Dict[str, float]:
    """Hammer `url+endpoint` with `clients` threads, each issuing
    `requests_per_client` sequential POSTs (closed-loop clients — the
    serving-benchmark standard). Returns latency percentiles, RPS, error
    count, and the server's own /stats batch-fill figures."""
    bodies = [_jpeg(np.random.default_rng(seed + i)) for i in range(8)]
    lat: List[float] = []
    errors: List[str] = []
    lock = threading.Lock()
    start_gate = threading.Event()

    def client(cid: int) -> None:
        my_lat = []
        my_err = []
        start_gate.wait()
        for k in range(requests_per_client):
            body = bodies[(cid + k) % len(bodies)]
            t0 = time.perf_counter()
            try:
                req = urllib.request.Request(
                    url + endpoint, data=body,
                    headers={"Content-Type": "application/octet-stream"})
                with urllib.request.urlopen(req, timeout=timeout) as r:
                    json.load(r)
                my_lat.append(time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001 — counted, not fatal
                my_err.append(f"{type(e).__name__}: {e}")
        with lock:
            lat.extend(my_lat)
            errors.extend(my_err)

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(clients)]
    for t in threads:
        t.start()
    t_start = time.perf_counter()
    start_gate.set()
    for t in threads:
        t.join(timeout=timeout * requests_per_client)
    wall = time.perf_counter() - t_start

    out: Dict[str, float] = {
        "clients": clients,
        "requests": len(lat),
        "errors": len(errors),
        "wall_s": round(wall, 3),
        "rps": round(len(lat) / wall, 1) if wall > 0 else 0.0,
    }
    if errors:
        out["first_error"] = errors[0]  # type: ignore[assignment]
    if lat:
        q = np.quantile(np.asarray(lat), [0.5, 0.9, 0.99])
        out.update(p50_ms=round(1e3 * q[0], 2), p90_ms=round(1e3 * q[1], 2),
                   p99_ms=round(1e3 * q[2], 2))
    try:
        with urllib.request.urlopen(url + "/stats", timeout=10) as r:
            stats = json.load(r)
        key = "classify" if "classify" in endpoint else "detect"
        if key in stats:
            out["server_mean_batch"] = stats[key].get("mean_batch", 0.0)
            out["server_batches"] = stats[key].get("batches", 0)
            out["server_p50_ms"] = stats[key].get("p50_ms", 0.0)
            out["server_p99_ms"] = stats[key].get("p99_ms", 0.0)
    except Exception:  # stats endpoint is best-effort
        pass
    return out


def main(argv=None) -> Dict[str, float]:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    ap.add_argument("--endpoint", default="/v1/classify")
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=32,
                    help="requests per client")
    ap.add_argument("--timeout", type=float, default=60.0)
    a = ap.parse_args(argv)
    res = run_load(a.url, a.endpoint, a.clients, a.requests, a.timeout)
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
