"""Power-usage measurement CLI.

The calculate-power-usage.py analogue (code/disaster_detection/
calculate-power-usage.py:214-280): run classifier inference over a
fraction of the AIDER data while logging a power trace, then report
total energy / average power / energy-per-frame and optionally plot the
trace with event markers (PowerLogger.showDataTraces / getTotalEnergy,
:105-211).

The reference samples INA3221 i2c sensors on a Jetson TX2 (:25-77); this
TPU has no power telemetry, so the trace is the documented busy-time
model (utils/profiler.py PowerMonitor): chip TDP while a dispatch is in
flight, idle watts otherwise. The reporting surface is the same.

Run: python -m rtdm_tpu.cli.power_usage --model squeeze-ernet \
         --weights w.npz --root-dir data/AIDER --test-data-pc 30
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Model-based power/energy report for TPU inference")
    p.add_argument("--model", default="squeeze-ernet",
                   choices=["ernet", "squeeze-ernet", "squeeze-redconv"])
    p.add_argument("--weights", help="our .npz or torch .pt state_dict")
    p.add_argument("--engine", help="serialized rtdm_tpu engine dir "
                   "(the --trt path, calculate-power-usage.py:223)")
    p.add_argument("--root-dir", default="data/AIDER")
    p.add_argument("--test-split", default="dataloaders/aider_test.csv")
    p.add_argument("--test-data-pc", type=int, default=30, metavar="N",
                   help="run on N%% of the split "
                        "(calculate-power-usage.py:220-221)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--chip-watts", type=float, default=None,
                   help="busy power; default from the device kind table")
    p.add_argument("--idle-watts", type=float, default=30.0)
    p.add_argument("--plot", help="write the power-trace PNG here "
                   "(showDataTraces analogue, :159-185)")
    args = p.parse_args(argv)
    if not args.engine and not args.weights:
        p.error("--weights is required unless --engine is given")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtdm_tpu.core.precision import policy_from_name
    from rtdm_tpu.data.aider import AiderDataset, BatchLoader, \
        normalize_batch
    from rtdm_tpu.models import create_model
    from rtdm_tpu.utils.profiler import PowerMonitor

    if args.engine:
        from rtdm_tpu.export.engine import Engine
        engine = Engine.load(args.engine)
        # the engine's spec is authoritative — its compiled program is
        # pinned to (batch, size, size, 3); ignoring it in favour of the
        # --model default would fail deep in XLA with a shape mismatch
        size = engine.spec.image_size
        args.batch_size = min(args.batch_size, engine.spec.batch_size)

        def forward(u8):
            return engine(u8)
    else:
        model = create_model(args.model)
        size = model.image_size
        policy = policy_from_name(args.precision)
        from rtdm_tpu.models.io import load_variables
        variables = load_variables(args.weights)
        from rtdm_tpu.models import with_checkpoint_head
        model = with_checkpoint_head(model, variables)
        cast = {"params": policy.cast_to_compute(variables["params"]),
                "batch_stats": variables["batch_stats"]}

        @jax.jit
        def _fwd(u8):
            x = normalize_batch(u8).astype(policy.compute_dtype)
            return model.apply(cast, x, train=False)

        def forward(u8):
            return _fwd(u8)

    ds = AiderDataset(args.test_split, args.root_dir, size)
    n = max(int(len(ds) * args.test_data_pc / 100.0), args.batch_size)
    rng = np.random.default_rng(0)
    ds.samples = [ds.samples[i]
                  for i in rng.permutation(len(ds))[:min(n, len(ds))]]
    loader = BatchLoader(ds, args.batch_size, num_workers=4)

    mon = PowerMonitor(chip_watts=args.chip_watts,
                       idle_watts=args.idle_watts)
    mon.start()
    frames = 0
    warm = False
    for images, labels, valid in loader:
        dev = jax.device_put(jnp.asarray(images))
        if not warm:  # compile outside the energy account
            np.asarray(forward(dev))
            warm = True
            mon.mark_event("inferenceStart")
        t0 = time.perf_counter()
        np.asarray(forward(dev))
        mon.record_busy(time.perf_counter() - t0)
        frames += int(valid)
    mon.mark_event("inferenceEnd")
    mon.stop()

    total_j = mon.get_total_energy()
    span = mon.samples[-1].t if mon.samples else 0.0
    # the per-node table analogue (printFullReport, :83-98): one modelled
    # chip instead of 12 INA3221 rails
    print(f"{'node':>14} {'busy W':>8} {'idle W':>8} {'avg W':>8}")
    print(f"{'tpu/chip':>14} {mon.chip_watts:>8.1f} {mon.idle_watts:>8.1f} "
          f"{total_j / max(span, 1e-9):>8.1f}")
    print(f"frames {frames}  wall {span:.2f}s  "
          f"({frames / max(span, 1e-9):.1f} FPS)")
    print(f"total energy (modelled): {total_j:.1f} J")
    print(f"energy/frame: {mon.energy_per_frame(frames):.3f} mJ")
    if args.plot:
        print(f"power trace: {mon.plot(args.plot)}")
    return {"frames": frames, "total_j": total_j,
            "mj_per_frame": mon.energy_per_frame(frames)}


if __name__ == "__main__":
    main()
