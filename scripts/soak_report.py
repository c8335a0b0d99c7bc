#!/usr/bin/env python
"""Summarize training-at-scale soak legs into a markdown table.

Reads each leg under runs/soak/<leg>/ (results.txt written by
cli/yolo_train.py, or the epoch lines cli/aider_train.py logs) plus the
driver log runs/soak/<leg>.log, and emits:

  * a per-leg markdown row: epochs completed, distinct compiled train-step
    programs ("building train step" events — the recompile-churn counter),
    first-epoch wall (pays the remaining compiles), steady-state epoch wall
    (median over non-eval epochs after the last compile), host-pipeline
    throughput (train imgs / steady epoch wall), and the final metric
    (mAP@0.5 or val acc);
  * copies of results.txt / results.png / final log tail into
    artifacts/soak/<leg>/ so the evidence can be committed (runs/ is
    gitignored).

Usage: python scripts/soak_report.py [--runs runs/soak] [--n-train N]
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import statistics

TS_RE = re.compile(r"^(?:\w+:)?(\d{4}-\d\d-\d\d \d\d:\d\d:\d\d),\d+")
EPOCH_RE = re.compile(
    r"epoch (\d+)/(\d+)[: ].*?(\d+(?:\.\d+)?)s(?=\s*(?:\||$))")
MAP_RE = re.compile(r"mAP@0\.5 ([0-9.]+)")
ACC_RE = re.compile(r"val loss [0-9.]+ acc ([0-9.]+)")
# train-step builds log square sizes ("416") OR rect bucket tuples
# ("(256, 416)") — keep them as strings so both survive
BUILD_RE = re.compile(
    r"building train step for size (\(\d+, \d+\)|\d+)( \[[^]]+\])?")


def _ts(line: str):
    """Epoch-seconds of a log line's leading timestamp, or None."""
    import datetime
    m = TS_RE.match(line)
    if not m:
        return None
    return datetime.datetime.strptime(
        m.group(1), "%Y-%m-%d %H:%M:%S").timestamp()


def parse_leg(leg_dir: str, log_path: str):
    """Return a dict of soak stats for one leg, or None if it never ran.

    steady_epoch_s = median wall over epochs that END after the last
    'building train step' log line (so mid-run multi-scale/rect recompile
    epochs are excluded), restricted to non-eval epochs when any exist.
    Classifier legs log val metrics on every line, so their wall includes
    per-epoch eval — flagged via eval_inclusive so imgs/s is labelled."""
    log_text = open(log_path).read() if os.path.exists(log_path) else ""
    log_lines = log_text.splitlines()

    last_build_ts = None
    for ln in log_lines:
        if "building train step" in ln:
            t = _ts(ln)
            if t is not None:
                last_build_ts = t

    epochs = []  # (idx, total, wall_s, metric|None, after_last_build)
    for ln in log_lines:
        m = EPOCH_RE.search(ln)
        if not m:
            continue
        mm = MAP_RE.search(ln) or ACC_RE.search(ln)
        metric = float(mm.group(1)) if mm else None
        t = _ts(ln)
        after = (t is not None and last_build_ts is not None
                 and t > last_build_ts)
        epochs.append((int(m.group(1)), int(m.group(2)),
                       float(m.group(3)), metric, after))
    if not epochs:  # no log: fall back to results.txt (no timestamps)
        res_path = os.path.join(leg_dir, "results.txt")
        if os.path.exists(res_path):
            for ln in open(res_path).read().splitlines():
                m = EPOCH_RE.search(ln)
                if not m:
                    continue
                mm = MAP_RE.search(ln) or ACC_RE.search(ln)
                epochs.append((int(m.group(1)), int(m.group(2)),
                               float(m.group(3)),
                               float(mm.group(1)) if mm else None, False))
    if not epochs:
        return None

    builds = BUILD_RE.findall(log_text)
    sizes = sorted({s for s, _ in builds})
    post = [e for e in epochs if e[4]]
    pool = post if post else epochs[1:] if len(epochs) > 1 else epochs
    # prefer pure-train walls; classifier legs have none (every line
    # carries the val metric), so fall back and flag it
    plain = [w for _, _, w, met, _ in pool if met is None]
    eval_inclusive = not plain
    steady = statistics.median(
        plain if plain else [w for _, _, w, _, _ in pool])
    metrics = [(i, met) for i, _, _, met, _ in epochs if met is not None]
    return {
        "epochs_done": epochs[-1][0],
        "epochs_planned": epochs[0][1],
        "compiles": len(builds),
        "compile_sizes": sizes,
        "first_epoch_s": epochs[0][2],
        "steady_epoch_s": steady,
        "eval_inclusive": eval_inclusive,
        "metric_first": metrics[0] if metrics else None,
        "metric_last": metrics[-1] if metrics else None,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--runs", default="runs/soak")
    p.add_argument("--n-train", type=int, default=800,
                   help="train-set size for imgs/s (detection legs)")
    p.add_argument("--n-train-cls", type=int, default=800)
    p.add_argument("--artifacts", default="artifacts/soak")
    a = p.parse_args(argv)

    legs = sorted(d for d in os.listdir(a.runs)
                  if os.path.isdir(os.path.join(a.runs, d)))
    rows = []
    for leg in legs:
        leg_dir = os.path.join(a.runs, leg)
        stats = parse_leg(leg_dir, os.path.join(a.runs, leg + ".log"))
        if stats is None:
            print(f"{leg}: no epochs parsed — skipped")
            continue
        n_train = a.n_train_cls if "aider" in leg or "cls" in leg \
            else a.n_train
        ips = n_train / stats["steady_epoch_s"]
        ips_s = f"{ips:.0f}" + ("†" if stats["eval_inclusive"] else "")
        met = stats["metric_last"]
        met_s = f"{met[1]:.3f} (ep{met[0]})" if met else "—"
        met0 = stats["metric_first"]
        met0_s = f"{met0[1]:.3f} (ep{met0[0]})" if met0 else "—"
        sizes = ",".join(stats["compile_sizes"]) or "—"
        rows.append(
            f"| {leg} | {stats['epochs_done']}/{stats['epochs_planned']} "
            f"| {stats['compiles']} ({sizes}) "
            f"| {stats['first_epoch_s']:.0f} s "
            f"| {stats['steady_epoch_s']:.1f} s | {ips_s} "
            f"| {met0_s} → {met_s} |")

        # freeze the committable evidence
        dst = os.path.join(a.artifacts, leg)
        os.makedirs(dst, exist_ok=True)
        for f in ("results.txt", "results.png", "labels.png",
                  "train_batch0.jpg"):
            src = os.path.join(leg_dir, f)
            if os.path.exists(src):
                shutil.copy2(src, os.path.join(dst, f))
        log_src = os.path.join(a.runs, leg + ".log")
        if os.path.exists(log_src):
            tail = open(log_src).read().splitlines()[-40:]
            with open(os.path.join(dst, "log_tail.txt"), "w") as f:
                f.write("\n".join(tail) + "\n")

    print("| leg | epochs | train-step compiles (sizes) | first epoch "
          "| steady epoch | imgs/s | metric first → last |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(r)
    print("\n† epoch wall includes per-epoch val eval (classifier legs "
          "log val metrics every epoch), so imgs/s is understated.")


if __name__ == "__main__":
    main()
