"""Freeze evolve-run evidence into artifacts/ (round 5).

Regenerates hyp_evolved.yaml + evolve.png from evolve.txt — needed when
a continuation run is stopped mid-generation (the normal flow only
writes them after the full GENS loop, cli/yolo_train.py:983-996) — and
copies the evidence set into artifacts/evolve_r5/.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/evolve_collect.py [out_dir]
"""

import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from rtdm_tpu.train.evolve import (EvolveLog, FITNESS_W_V3,  # noqa: E402
                                   V3_EVOLVE_META, fitness)
from rtdm_tpu.utils.plots import plot_evolution_results  # noqa: E402


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "runs/evolve_r5"
    meta = V3_EVOLVE_META
    w_fit = FITNESS_W_V3
    log = EvolveLog(os.path.join(out, "evolve.txt"), meta, w_fit)
    rows = log.load()
    assert rows is not None and len(rows), f"no rows in {log.path}"
    log.save_yaml(os.path.join(out, "hyp_evolved.yaml"))
    plot_evolution_results(log.path, os.path.join(out, "evolve.png"),
                           keys=list(meta), w_fit=w_fit)
    fits = fitness(rows, w_fit)
    print(f"{len(rows)} generations; fitness min {fits.min():.5f} "
          f"max {fits.max():.5f}")
    art = "artifacts/evolve_r5"
    os.makedirs(art, exist_ok=True)
    for name in ("evolve.txt", "hyp_evolved.yaml", "evolve.png"):
        src = os.path.join(out, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(art, name))
    print(f"evidence -> {art}")


if __name__ == "__main__":
    main()
