"""Test-set classification evaluation CLI.

Parity with the reference's evaluate-classification-metrics.py:49-196:
accuracy / F1 / precision / recall, per-class breakdown from the confusion
matrix, and FPS timed over forward passes only (sync-bracketed, data
already on device — matching :70-79's bracketing). `--engine` evaluates a
serialized engine (the --trt analogue).

Run: python -m rtdm_tpu.cli.evaluate_classification \
         --model squeeze-ernet --weights ... --root-dir data/AIDER \
         --test-split .../aider_test.csv
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate AIDER classifier")
    p.add_argument("--model", default="squeeze-ernet",
                   choices=["ernet", "squeeze-ernet", "squeeze-redconv"])
    p.add_argument("--weights", help="weights: our .npz or torch .pt state_dict")
    p.add_argument("--engine", help="serialized rtdm_tpu engine dir")
    p.add_argument("--root-dir", default="data/AIDER")
    p.add_argument("--test-split", default="dataloaders/aider_test.csv")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--data-parallel", action="store_true",
                   help="shard eval batches over ALL local devices "
                   "(mesh serving engine; single-device behavior is "
                   "unchanged on a 1-chip host)")
    args = p.parse_args(argv)
    if not args.engine and not args.weights:
        p.error("--weights is required unless --engine is given")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtdm_tpu.core.precision import policy_from_name
    from rtdm_tpu.data.aider import AiderDataset, BatchLoader, normalize_batch
    from rtdm_tpu.eval.classification import ClassificationMetrics
    from rtdm_tpu.models import create_model
    from rtdm_tpu.models.ernet import CLASS_NAMES

    model = create_model(args.model)
    size = model.image_size
    policy = policy_from_name(args.precision)

    mesh = None
    if args.data_parallel:
        from rtdm_tpu.core.mesh import local_mesh, require_data_divisible
        mesh = local_mesh()
        if not args.engine:
            # the engine path validates its OWN spec.batch_size and pads
            # caller batches; only the raw-weights jit needs this batch
            try:
                require_data_divisible(args.batch_size, mesh,
                                       "--batch-size")
            except ValueError as e:
                raise SystemExit(str(e))

    if args.engine:
        from rtdm_tpu.export.engine import Engine
        engine = Engine.load(args.engine, mesh=mesh)
        def forward(u8):
            return engine(u8)
    else:
        from rtdm_tpu.models import with_checkpoint_head
        from rtdm_tpu.models.io import load_variables
        variables = load_variables(args.weights)
        model = with_checkpoint_head(model, variables)
        cast = {"params": policy.cast_to_compute(variables["params"]),
                "batch_stats": variables["batch_stats"]}

        jit_kwargs = {}
        if mesh is not None:
            from rtdm_tpu.core.mesh import data_sharding
            jit_kwargs = {"in_shardings": (None, data_sharding(mesh)),
                          "out_shardings": data_sharding(mesh)}

        def _fwd_impl(v, u8):
            x = normalize_batch(u8).astype(policy.compute_dtype)
            return model.apply(v, x, train=False)
        _fwd = jax.jit(_fwd_impl, **jit_kwargs)

        def forward(u8):
            return _fwd(cast, u8)

    ds = AiderDataset(args.test_split, args.root_dir, size)
    loader = BatchLoader(ds, args.batch_size, num_workers=args.num_workers)
    metrics = ClassificationMetrics(len(CLASS_NAMES), CLASS_NAMES)
    times = []
    warm = False
    for images, labels, valid in loader:
        dev = jax.device_put(jnp.asarray(images))
        if not warm:
            np.asarray(forward(dev))  # compile + warm-up, first batch only
            warm = True
        t0 = time.perf_counter()
        probs = np.asarray(forward(dev))
        times.append(time.perf_counter() - t0)
        preds = np.argmax(probs[:valid], axis=-1)
        cm = np.zeros((len(CLASS_NAMES),) * 2, np.int64)
        np.add.at(cm, (labels[:valid], preds), 1)
        metrics.update(cm, 0.0, valid)

    print(metrics.report())
    if times:
        mean_t = float(np.mean(times[1:] if len(times) > 1 else times))
        print(f"avg inference time/batch: {mean_t * 1e3:.3f} ms  "
              f"({args.batch_size / mean_t:.1f} frames/s)")
    return metrics


if __name__ == "__main__":
    main()
