"""AIDER classifier training CLI.

TPU-native re-design of the reference trainer entry point
(code/disaster_detection/train.py:129-411 + training_utils/args.py:6-183):
same knob surface (model/loss/optimizer/scheduler choices, grad accum,
early stopping, resume), but the loop drives one jitted XLA train step per
batch over a data-parallel mesh; checkpoints via Orbax; bf16 by default.

Run: python -m rtdm_tpu.cli.aider_train --model squeeze-ernet \
         --root-dir data/AIDER --train-split .../aider_train.csv ...
"""

from __future__ import annotations

import argparse
import math
import dataclasses
import logging
import os
import time
from typing import Dict, List, Tuple

import numpy as np

logger = logging.getLogger("rtdm_tpu.train")


def parse_args(argv=None):
    from rtdm_tpu.core.config import TrainingConfig

    p = argparse.ArgumentParser(description="Train AIDER classifiers on TPU")
    p.add_argument("--model", default="squeeze-ernet",
                   choices=["ernet", "squeeze-ernet", "squeeze-redconv"])
    p.add_argument("--loss", default="label_smoothing_ce",
                   choices=["crossentropy", "label_smoothing_ce", "focal"])
    p.add_argument("--optimizer", default="adamw",
                   choices=["adam", "adamw", "sgd"])
    p.add_argument("--scheduler", default="onecycle",
                   choices=["onecycle", "cosine", "reduce"])
    p.add_argument("--root-dir", default="data/AIDER")
    p.add_argument("--train-split", default="dataloaders/aider_train.csv")
    p.add_argument("--val-split", default="dataloaders/aider_val.csv")
    p.add_argument("--test-split", default="dataloaders/aider_test.csv")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--label-smoothing", type=float, default=0.1)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--grad-accum-steps", type=int, default=2)
    p.add_argument("--warmup-ratio", type=float, default=0.1)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--patience", type=int, default=20)
    p.add_argument("--no-early-stopping", action="store_true")
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--mixup-alpha", type=float, default=0.2)
    p.add_argument("--cutmix-alpha", type=float, default=0.1)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--checkpoint-dir", default="saves")
    p.add_argument("--log-dir", default="logs")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--summary", action="store_true",
                   help="print the model summary (params + FLOPs) and exit")
    p.add_argument("--seed", type=int, default=42)
    # remaining args.py:6-183 surface
    p.add_argument("--weights", default=None,
                   help="weights path: where the final model lands "
                        "(default <checkpoint-dir>/<model>.npz) and, with "
                        "--pretrained, the initial weights (.pt/.npz) "
                        "(args.py:18-19)")
    p.add_argument("--pretrained", action="store_true",
                   help="start from --weights instead of fresh init "
                        "(args.py:14; the reference merely skips its "
                        "custom init — loading actual weights is the "
                        "useful reading of the flag)")
    p.add_argument("--min-lr", type=float, default=1e-6,
                   help="cosine/plateau lr floor (args.py:56)")
    p.add_argument("--momentum", type=float, default=0.9,
                   help="SGD momentum (args.py:60)")
    p.add_argument("--warmup-epochs", type=int, default=None,
                   help="warmup length in epochs; overrides --warmup-ratio "
                        "(args.py:73)")
    p.add_argument("--dropout", type=float, default=0.2,
                   help="model dropout probability (args.py:79)")
    p.add_argument("--image-size", type=int, default=None,
                   help="input size override (args.py:35; the reference "
                        "infers 240 ernet / 140 squeeze from the model — "
                        "that stays the default)")
    p.add_argument("--checkpoint-freq", type=int, default=1, metavar="E",
                   help="save the resumable 'last' state every E epochs "
                        "(args.py:95; best is always saved on improvement)")
    p.add_argument("--save-best-only", action="store_true",
                   help="skip the periodic 'last' saves; keep best + the "
                        "final state (args.py:97)")
    p.add_argument("--no-albumentations", action="store_true",
                   help="torchvision-style train augs instead of the "
                        "albumentations set (args.py:37, aider.py:392-409)")
    p.add_argument("--no-amp", action="store_true",
                   help="alias for --precision fp32 (args.py:89; bf16 "
                        "needs no GradScaler so 'amp' is just the policy)")
    p.add_argument("--no-pin-memory", action="store_true",
                   help="accepted for parity (args.py:45): TPU batches "
                        "are device_put from pageable host memory either "
                        "way — no pinning knob exists")
    p.add_argument("--debug", action="store_true",
                   help="debug-level logging (args.py:109)")
    a = p.parse_args(argv)
    if a.debug:
        logging.getLogger("rtdm_tpu").setLevel(logging.DEBUG)
    cfg = TrainingConfig(
        model=a.model, loss=a.loss, optimizer=a.optimizer,
        scheduler=a.scheduler, root_dir=a.root_dir,
        train_split=a.train_split, val_split=a.val_split,
        test_split=a.test_split, batch_size=a.batch_size, epochs=a.epochs,
        lr=a.lr, weight_decay=a.weight_decay,
        label_smoothing=a.label_smoothing, grad_clip=a.grad_clip,
        grad_accum_steps=a.grad_accum_steps, warmup_ratio=a.warmup_ratio,
        precision="fp32" if a.no_amp else a.precision,
        patience=a.patience,
        early_stopping=not a.no_early_stopping, augment=not a.no_augment,
        mixup_alpha=a.mixup_alpha, cutmix_alpha=a.cutmix_alpha,
        num_workers=a.num_workers, checkpoint_dir=a.checkpoint_dir,
        log_dir=a.log_dir, resume=a.resume, seed=a.seed,
        pretrained=a.pretrained, min_lr=a.min_lr, momentum=a.momentum,
        dropout=a.dropout, checkpoint_freq=a.checkpoint_freq,
        save_best_only=a.save_best_only,
        use_albumentations=not a.no_albumentations, debug=a.debug)
    if a.weights is not None:
        cfg.weights = a.weights
    if a.image_size is not None:  # post-override: __post_init__ infers
        cfg.image_size = a.image_size  # 240/140 from the model name
    if a.warmup_epochs is not None:
        cfg.warmup_epochs = a.warmup_epochs
        cfg.warmup_ratio = a.warmup_epochs / max(a.epochs, 1)
    return cfg


def current_lr(opt_state) -> float:
    """Dig the injected learning rate out of a (possibly chained) opt state."""
    import jax
    for leaf in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: hasattr(x, "hyperparams")):
        if hasattr(leaf, "hyperparams") and "learning_rate" in leaf.hyperparams:
            return float(leaf.hyperparams["learning_rate"])
    return float("nan")


def train_model(config) -> Tuple[object, Dict[str, List[float]]]:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rtdm_tpu.core.mesh import local_mesh
    from rtdm_tpu.export.exec_cache import enable_persistent_cache
    enable_persistent_cache()  # repeat runs skip XLA for unchanged steps
    from rtdm_tpu.core.precision import policy_from_name
    from rtdm_tpu.data.aider import AiderDataset, BatchLoader, normalize_batch
    from rtdm_tpu.eval.classification import ClassificationMetrics
    from rtdm_tpu.models import create_model
    from rtdm_tpu.models.ernet import CLASS_NAMES
    from rtdm_tpu.train.checkpoint import CheckpointManager
    from rtdm_tpu.train.losses import make_classification_loss
    from rtdm_tpu.train.schedules import (PlateauScaler, make_optimizer,
                                          make_schedule)
    from rtdm_tpu.train.trainer import Trainer
    from rtdm_tpu.utils.early_stopping import EarlyStopping
    from rtdm_tpu.utils.meters import AverageMeter

    mesh = local_mesh()
    n_dev = mesh.devices.size
    policy = policy_from_name(config.precision)
    size = config.image_size

    # Batch must tile the mesh and the microbatch split.
    bs = config.batch_size
    tile = n_dev * max(config.grad_accum_steps, 1)
    if bs % tile:
        bs = ((bs + tile - 1) // tile) * tile
        logger.info("batch_size rounded to %d (devices x accum)", bs)

    train_ds = AiderDataset(config.train_split, config.root_dir, size,
                            train=config.augment, seed=config.seed,
                            aug_style=("albumentations"
                                       if config.use_albumentations
                                       else "torchvision"))
    val_ds = AiderDataset(config.val_split, config.root_dir, size)
    test_ds = AiderDataset(config.test_split, config.root_dir, size)
    if len(train_ds) < bs:
        # drop_last would silently yield ZERO batches and the "training"
        # loop would report 0.0 losses forever
        raise SystemExit(
            f"train split has {len(train_ds)} images < one batch of {bs} "
            f"(batch_size after small-model doubling and device/accum "
            f"tiling) — lower --batch-size or add data")
    train_loader = BatchLoader(train_ds, bs, shuffle=True, drop_last=True,
                               num_workers=config.num_workers,
                               seed=config.seed)
    val_loader = BatchLoader(val_ds, bs, num_workers=config.num_workers)
    test_loader = BatchLoader(test_ds, bs, num_workers=config.num_workers)

    class_weights = (train_ds.class_weights()
                     if config.loss == "focal" else None)
    loss_fn = make_classification_loss(
        config.loss, label_smoothing=config.label_smoothing,
        focal_gamma=config.focal_gamma, class_weights=class_weights)

    total_steps = max(len(train_loader), 1) * config.epochs
    schedule = make_schedule(config.scheduler, config.lr, total_steps,
                             config.warmup_ratio, config.min_lr)
    tx = make_optimizer(config.optimizer, schedule, config.weight_decay,
                        config.momentum, config.grad_clip)

    model = create_model(config.model, dropout_rate=config.dropout,
                         num_classes=config.num_classes)
    trainer = Trainer(model, tx, loss_fn, policy=policy,
                      grad_accum_steps=config.grad_accum_steps, mesh=mesh,
                      num_classes=config.num_classes,
                      mixup_alpha=config.mixup_alpha if config.augment else 0.0,
                      cutmix_alpha=config.cutmix_alpha if config.augment else 0.0)
    state = trainer.init_state(jax.random.key(config.seed),
                               (1, size, size, 3))
    if config.pretrained and not config.resume:
        # --pretrained: start from --weights (.pt state_dict or .npz)
        # instead of fresh init (args.py:14-19; reference train.py:177
        # merely skips re-init — actually loading weights is the useful
        # reading, and .pt covers the shipped reference checkpoints)
        if config.weights.endswith((".pt", ".pth")):
            from rtdm_tpu.models.torch_import import \
                load_classifier_checkpoint
            pre = load_classifier_checkpoint(config.weights)
        else:
            from rtdm_tpu.models.io import load_variables
            pre = load_variables(config.weights)
        state = state.replace(params=pre["params"],
                              batch_stats=pre.get("batch_stats",
                                                  state.batch_stats))
        logger.info("pretrained weights loaded from %s", config.weights)

    # collision-free run dirs (increment_path, general.py): a fresh run
    # never clobbers an existing non-empty checkpoint/log dir; resume
    # lands in the same dirs by design (train.py:229-248)
    from rtdm_tpu.utils.paths import increment_path
    weights_was_default = (config.weights == os.path.join(
        config.checkpoint_dir, f"{config.model}.npz"))
    config.checkpoint_dir = increment_path(config.checkpoint_dir,
                                           exist_ok=config.resume)
    config.log_dir = increment_path(config.log_dir, exist_ok=config.resume)
    if weights_was_default:
        # keep the defaulted final-weights path inside THIS run's resolved
        # dir — the pre-increment default would overwrite run 1's weights
        config.weights = os.path.join(config.checkpoint_dir,
                                      f"{config.model}.npz")
    # config.json lands in the RESOLVED run dir (saving before the
    # increment would both create the dir — forcing the bump — and strand
    # the json outside the actual run)
    config.save()
    ckpt = CheckpointManager(config.checkpoint_dir)
    history: Dict[str, List[float]] = {k: [] for k in
                                       ("train_loss", "train_acc", "val_loss",
                                        "val_acc", "val_f1", "lr")}
    start_epoch = 0
    if config.resume and ckpt.exists("last"):
        state, meta = ckpt.restore("last", state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        history = meta.get("history", history)
        logger.info("resumed from epoch %d", start_epoch)

    data_sh = NamedSharding(mesh, P("data"))

    def put_batch(images, labels):
        x = jax.device_put(jnp.asarray(images), data_sh)
        y = jax.device_put(jnp.asarray(labels), data_sh)
        return x, y

    from rtdm_tpu.utils.experiment_log import ExperimentLogger
    explog = ExperimentLogger(config.log_dir, run_name=config.model,
                              config=dataclasses.asdict(config))

    stopper = EarlyStopping(config.patience)
    plateau = (PlateauScaler(patience=max(config.epochs // 3, 1),
                             base_lr=config.lr, min_lr=config.min_lr)
               if config.scheduler == "reduce" else None)
    base_rng = jax.random.key(config.seed + 1)
    best_val = float("inf")
    if start_epoch and history.get("val_loss"):
        # a resumed run competes against the PRE-interrupt best — without
        # this the first post-resume epoch always overwrote 'best'
        # (reference resume restores best metrics, train.py:229-248)
        best_val = float(min(history["val_loss"]))
        stopper.best_loss = best_val

    # uint8 batches go to device as-is; /255 + ImageNet normalize runs on
    # device and XLA fuses it into the first conv of each step.
    @jax.jit
    def _norm(x):
        return normalize_batch(x)

    def train_step(state, images_u8, labels, rng):
        return trainer.train_step(state, _norm(images_u8), labels, rng)

    def eval_step(state, images_u8, labels, valid):
        return trainer.eval_step(state, _norm(images_u8), labels, valid)

    def run_eval(loader):
        metrics = ClassificationMetrics(config.num_classes, CLASS_NAMES)
        for images, labels, valid in loader:
            x, y = put_batch(images, labels)
            out = eval_step(state, x, y, jnp.asarray(valid, jnp.int32))
            out = jax.device_get(out)
            metrics.update(out["confusion"], out.get("loss_sum", 0.0),
                           out["count"])
        return metrics

    for epoch in range(start_epoch, config.epochs):
        t0 = time.time()
        loss_m, acc_m = AverageMeter("loss"), AverageMeter("acc")
        # one-step-lagged metric fetch: reading step N-1's scalars while
        # step N is dispatched overlaps the device round-trip with compute
        # (a same-step device_get serializes every step on the remote
        # tunnel; same pipelining as cli/yolo_train.py's loss fetch)
        pending = None

        def drain(p):
            pm, pn = p
            pm = jax.device_get(pm)
            if not math.isfinite(float(pm["loss"])):
                # non-finite loss abort — same sanitizer guard as the
                # detector trainer (yolov3/train.py:284-286 analogue)
                raise SystemExit(
                    f"non-finite train loss {float(pm['loss'])} "
                    f"(epoch {epoch + 1}) — aborting")
            loss_m.update(float(pm["loss"]), pn)
            acc_m.update(float(pm["accuracy"]), pn)

        for images, labels, _ in train_loader:
            x, y = put_batch(images, labels)
            state, m = train_step(state, x, y, base_rng)
            if pending is not None:
                drain(pending)
            pending = (m, len(labels))
        if pending is not None:
            drain(pending)

        val = run_eval(val_loader)
        lr = current_lr(state.opt_state)
        history["train_loss"].append(loss_m.avg)
        history["train_acc"].append(acc_m.avg)
        history["val_loss"].append(val.loss)
        history["val_acc"].append(val.accuracy)
        history["val_f1"].append(val.f1("weighted"))
        history["lr"].append(lr)
        explog.log_scalars(epoch, {"train_loss": loss_m.avg,
                                   "train_acc": acc_m.avg,
                                   "val_loss": val.loss,
                                   "val_acc": val.accuracy,
                                   "val_f1": val.f1("weighted"),
                                   "lr": lr})
        logger.info(
            "epoch %d/%d: train loss %.4f acc %.4f | val loss %.4f acc %.4f "
            "f1 %.4f | lr %.2e | %.1fs", epoch + 1, config.epochs,
            loss_m.avg, acc_m.avg, val.loss, val.accuracy,
            val.f1("weighted"), lr, time.time() - t0)

        if plateau is not None:
            scale = plateau.update(val.loss)
            _set_lr(state.opt_state, config.lr * scale)

        meta = {"epoch": epoch, "history": history,
                "config": dataclasses.asdict(config),
                "val_loss": val.loss, "val_acc": val.accuracy}
        # 'last' lands every --checkpoint-freq epochs and on the final
        # epoch (reference train.py:304); --save-best-only skips the
        # periodic saves, keeping best + the final resumable state
        final_epoch = epoch == config.epochs - 1
        if final_epoch or (not config.save_best_only
                           and (epoch + 1)
                           % max(config.checkpoint_freq, 1) == 0):
            ckpt.save("last", state, meta)
        improved = stopper(val.loss)
        if val.loss < best_val:
            best_val = val.loss
            ckpt.save("best", state, meta)
        if config.early_stopping and stopper.should_stop:
            logger.info("early stopping at epoch %d", epoch + 1)
            break

    if ckpt.exists("best"):
        state, _ = ckpt.restore("best", state)
    test = run_eval(test_loader)
    logger.info("test:\n%s", test.report())

    from rtdm_tpu.models.io import save_variables
    wpath = save_variables(config.weights,
                           {"params": jax.device_get(state.params),
                            "batch_stats": jax.device_get(state.batch_stats)})
    logger.info("final weights saved to %s", wpath)
    explog.log_artifact(wpath)
    explog.close()

    try:
        from rtdm_tpu.utils.plots import plot_training_curves
        plot_training_curves(history, config.log_dir, config.model)
    except Exception as e:  # plotting must never fail a run
        logger.warning("plotting failed: %s", e)
    return state, history


def _set_lr(opt_state, lr: float) -> None:
    import jax
    for leaf in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: hasattr(x, "hyperparams")):
        if hasattr(leaf, "hyperparams") and "learning_rate" in leaf.hyperparams:
            leaf.hyperparams["learning_rate"] = jax.numpy.asarray(lr)


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    import sys
    if "--summary" in (argv or sys.argv):
        from rtdm_tpu.utils.summary import summarize_classifier
        args = argv or sys.argv[1:]
        name = (args[args.index("--model") + 1]
                if "--model" in args else "squeeze-ernet")
        print(summarize_classifier(name))
        return None
    config = parse_args(argv)
    train_model(config)  # saves config.json into the resolved run dir


if __name__ == "__main__":
    main()
