"""YOLO detector training CLI.

TPU-native re-design of yolov3/train.py:54-391: cfg-driven model, mosaic/
HSV/affine/flip augmentation, nominal-batch-64 gradient accumulation
(train.py:299-301), linear burn-in then cosine LR to lr0*10^lrf
(train.py:143), SGD(momentum)/Adam choice, per-epoch mAP eval, fitness-
weighted best checkpoint (train.py:343-345), results.txt append log.

The whole step (forward, yolo_loss, backward, accumulate, clip, update,
BN stats) is ONE jitted XLA program over the data-parallel mesh; eval
(forward+decode+NMS) is a second jitted program reused across epochs.

Run: python -m rtdm_tpu.cli.yolo_train --cfg .../yolov4-tiny-aider-416.cfg \
         --data .../aider.data --epochs 100
"""

from __future__ import annotations

import argparse
import logging
import os
import time

logger = logging.getLogger("rtdm_tpu.yolo_train")

# fitness weights, per family:
# darknet: over [P, R, mAP@0.5, F1] — mAP-dominated, mirroring the
# reference's fitness usage (yolov3/train.py:343-345)
FITNESS_W = (0.0, 0.01, 0.99, 0.0)
# v5: over [P, R, mAP@0.5, mAP@0.5:0.95] (yolov5/utils/metrics.py:12-15)
FITNESS_W_V5 = (0.0, 0.0, 0.1, 0.9)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train YOLO detectors on TPU")
    p.add_argument("--cfg", required=True)
    p.add_argument("--data", help="dataset .data file (required unless "
                   "--summary)")
    p.add_argument("--weights", help="initial weights (.weights/.pt/.npz)")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--img-size", type=int, default=416)
    p.add_argument("--lr0", type=float, default=0.001)
    p.add_argument("--lrf", type=float, default=None,
                   help="final lr = lr0 * 10**lrf (cosine; default -4 for "
                        "darknet cfgs; v5 yamls default to the hyp file's "
                        "one_cycle factor lrf, yolov5/train.py:135-139)")
    p.add_argument("--linear-lr", action="store_true",
                   help="linear lr decay instead of one_cycle cosine "
                        "(yolov5/train.py:136-137; v5 yaml models)")
    p.add_argument("--momentum", type=float, default=0.637)
    p.add_argument("--weight-decay", type=float, default=0.000084)
    p.add_argument("--optimizer", default="sgd", choices=["sgd", "adam"])
    p.add_argument("--burn-in", type=int, default=200,
                   help="linear LR warm-up steps")
    p.add_argument("--iou-t", type=float, default=0.3)
    p.add_argument("--fl-gamma", type=float, default=None,
                   help="focal gamma (default: 1.5 darknet, 0.0 v5)")
    p.add_argument("--giou-gain", type=float, default=1.0)
    p.add_argument("--cls-gain", type=float, default=37.4)
    p.add_argument("--obj-gain", type=float, default=64.3)
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--cache-images", action="store_true",
                   help="keep decoded frames in RAM across epochs "
                        "(yolov3/train.py --cache-images)")
    p.add_argument("--single-cls", action="store_true",
                   help="train as a single-class detector: every label "
                        "maps to class 0 (yolov5/train.py:77-78,473; "
                        "darknet cfgs must already be 1-class)")
    p.add_argument("--noautoanchor", action="store_true",
                   help="skip the train-start BPR anchor check "
                        "(yolov5/train.py:213-216; v5 yaml models only)")
    p.add_argument("--precision", default="fp32", choices=["bf16", "fp32"])
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--output", default="runs/train")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--eval-every", type=int, default=1,
                   help="mAP-eval every N epochs (0 = only after the "
                   "final epoch)")
    p.add_argument("--nominal-batch", type=int, default=64,
                   help="accumulate grads to this effective batch")
    p.add_argument("--evolve", type=int, default=0, metavar="N",
                   help="genetic hyperparameter evolution over N cycles "
                        "(yolov3/train.py:444-491 analogue)")
    p.add_argument("--hyp", help="hyp yaml overriding loss/aug knobs "
                   "(yolov5 data/hyp.scratch.yaml format)")
    p.add_argument("--multi-scale", action="store_true",
                   help="resize batches to 67-150%% of --img-size on "
                        "device (one compiled step per size)")
    p.add_argument("--rect", action="store_true",
                   help="rectangular training (yolov3/train.py:176 / "
                        "yolov5/train.py:189): AR-sorted stride-multiple "
                        "batch buckets, mosaic disabled, fixed sample "
                        "order; one compiled step per distinct bucket "
                        "shape")
    p.add_argument("--prebias", type=int, default=0, metavar="E",
                   help="train only detection-head biases for the first E "
                        "epochs (yolov3/train.py:221-233 analogue)")
    p.add_argument("--image-weights", action="store_true",
                   help="class-weighted image resampling per epoch "
                        "(train.py:236-239 analogue)")
    p.add_argument("--ema", action="store_true",
                   help="keep an EMA of the weights (ModelEMA analogue)")
    p.add_argument("--train-list-override",
                   help="use this image-list txt for training instead of "
                        "the .data file's train entry")
    p.add_argument("--resume", action="store_true",
                   help="resume from <output>/last_state (full state: "
                        "params, opt_state, EMA, epoch, best_fitness — "
                        "yolov3/train.py:352-369,427 analogue)")
    p.add_argument("--no-strip", action="store_true",
                   help="keep the optimizer-state checkpoint after a "
                        "completed run (skip the strip_optimizer finalize, "
                        "yolov5/utils/general.py:587)")
    p.add_argument("--no-plots", action="store_true",
                   help="skip the observability plots (label distribution, "
                        "train-batch mosaics, results curves — the "
                        "yolov5/utils/plots.py surface)")
    p.add_argument("--ckpt-every", type=int, default=1, metavar="E",
                   help="write the resumable full-state checkpoint every E "
                        "epochs (the reference saves every epoch; raise for "
                        "many-tiny-epoch runs)")
    p.add_argument("--nosave", action="store_true",
                   help="only save checkpoints on the final epoch "
                        "(yolov5/train.py:361 'not nosave or final_epoch')")
    p.add_argument("--notest", action="store_true",
                   help="only run the mAP eval on the final epoch — alias "
                        "for --eval-every 0 (yolov5/train.py:346 "
                        "'notest or final_epoch')")
    p.add_argument("--label-smoothing", type=float, default=None,
                   metavar="EPS",
                   help="v5 cls-BCE label smoothing epsilon; overrides the "
                        "hyp yaml value (yolov5/train.py:228, "
                        "loss.py smooth_BCE)")
    p.add_argument("--save-period", type=int, default=0, metavar="N",
                   help="also keep a backup{N}.npz weight snapshot every N "
                        "epochs (yolov3/train.py:368-369 backup%%g.pt; "
                        "yolov5 --save_period). 0 disables")
    p.add_argument("--summary", action="store_true",
                   help="print the per-layer model summary (model_info/"
                   "profile=True analogue) and exit")
    p.add_argument("--bn-burn-in", type=int, default=None, metavar="N",
                   help="freeze BN running stats for the first N batches "
                        "(yolov3/train.py:250-255; default 200 darknet, "
                        "0 for v5 yamls)")
    p.add_argument("--adam", action="store_true",
                   help="alias for --optimizer adam (yolov3/train.py "
                        "--adam / yolov5/train.py:468)")
    p.add_argument("--accumulate", type=int, default=None, metavar="N",
                   help="explicit grad-accumulation count, overriding the "
                        "--nominal-batch derivation (yolov3/train.py "
                        "--accumulate)")
    p.add_argument("--workers", type=int, default=None,
                   help="alias for --num-workers (yolov5/train.py:482)")
    p.add_argument("--project", default=None,
                   help="with --name: run dir = project/name, "
                        "collision-incremented (yolov5/train.py:484-486); "
                        "overrides --output")
    p.add_argument("--name", default="exp",
                   help="run name under --project (yolov5/train.py:485)")
    p.add_argument("--exist-ok", action="store_true",
                   help="reuse an existing project/name dir instead of "
                        "incrementing (yolov5/train.py:486)")
    p.add_argument("--sync-bn", action="store_true",
                   help="accepted for parity (yolov5/train.py:481): BN "
                        "statistics are ALREADY global-batch under the "
                        "GSPMD mesh — sharded reduces sum over all chips "
                        "(models/layers.py) — so this is a no-op")
    args = p.parse_args(argv)
    if args.adam:
        args.optimizer = "adam"
    if args.workers is not None:
        args.num_workers = args.workers
    if args.project is not None:
        args.output = os.path.join(args.project, args.name)
    return args


def train(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rtdm_tpu.export.exec_cache import enable_persistent_cache
    enable_persistent_cache()  # repeat runs skip XLA for unchanged steps

    if args.notest:
        args.eval_every = 0  # final epoch still evals (train loop contract)

    # resolve the run directory FIRST: anything written into it before
    # increment_path ran (e.g. the autoanchor yaml) would make the dir
    # look taken and split the run's artifacts across output and output2
    from rtdm_tpu.utils.paths import increment_path
    args.output = increment_path(args.output,
                                 exist_ok=args.resume or args.exist_ok)
    if args.sync_bn:
        logger.info("--sync-bn: BN statistics are already global-batch "
                    "under the GSPMD mesh; nothing to convert")

    from rtdm_tpu.cli.yolo_detect import load_weights_for_cfg
    from rtdm_tpu.core.mesh import local_mesh
    from rtdm_tpu.data.odder import (DetectionBatchLoader, DetectionDataset,
                                     load_data_spec)
    from rtdm_tpu.eval.map import DetectionEvaluator
    from rtdm_tpu.models.io import save_variables
    from rtdm_tpu.ops.nms import batched_nms, xywh_to_xyxy
    from rtdm_tpu.ops.yolo import decode_all
    from rtdm_tpu.train.yolo_loss import (YoloHyp, YoloHypV5, yolo_loss, yolo_loss_v5)

    mesh = local_mesh()
    n_dev = mesh.devices.size
    bs = max(args.batch_size // n_dev, 1) * n_dev
    accumulate = (max(args.accumulate, 1) if args.accumulate is not None
                  else max(round(args.nominal_batch / bs), 1))  # train.py:299
    # the in-step scan splits the loader batch into `accumulate`
    # microbatches, so it must DIVIDE bs (the reference steps every N
    # loader batches instead and has no such constraint) — clamp to the
    # largest divisor of bs not above the nominal-batch count
    accumulate = max(a for a in range(1, accumulate + 1) if bs % a == 0)

    dcfg = load_data_spec(args.data)  # darknet .data OR yolov5 data yaml
    base = str(dcfg["base"])
    train_list = args.train_list_override or dcfg["train"]
    hyp_file = {}
    if args.hyp:
        import yaml as _yaml
        with open(args.hyp) as f:
            hyp_file = _yaml.safe_load(f) or {}

    aug_keys = ("hsv_h", "hsv_s", "hsv_v", "degrees", "translate",
                "scale", "shear", "fliplr", "mosaic", "mosaic9", "mixup",
                "cutout")
    aug_hyp = {k: hyp_file[k] for k in aug_keys if k in hyp_file}
    nc_data = int(dcfg.get("classes", 2))  # type: ignore[arg-type]
    # --single-cls trains a 1-class detector over all labels
    # (yolov5/train.py:77 `nc = 1 if opt.single_cls`)
    nc = 1 if args.single_cls else nc_data
    if args.rect and args.image_weights:
        # the reference silently disables rect under image-weight
        # resampling (yolov5/utils/datasets.py:358 `rect = False if
        # image_weights else rect`)
        logger.warning("--image-weights disables --rect "
                       "(yolov5/utils/datasets.py:358)")
        args.rect = False
    if args.rect and args.multi_scale:
        raise SystemExit("--rect and --multi-scale are mutually exclusive: "
                         "multi-scale resizes square batches on device; "
                         "rect batches already vary their shape per bucket")
    train_ds = DetectionDataset(train_list, args.img_size,
                                base_dir=base, train=not args.no_augment,
                                aug_hyp=aug_hyp, seed=args.seed,
                                num_classes=nc_data,
                                single_cls=args.single_cls,
                                cache_images=args.cache_images,
                                rect=args.rect, batch_size=bs,
                                rect_pad=0.0)
    if len(train_ds) < bs:
        logger.warning("train set (%d) smaller than batch (%d): indices "
                       "will cycle", len(train_ds), bs)
    val_ds = DetectionDataset(dcfg["valid"], args.img_size,
                              base_dir=base, num_classes=nc_data,
                              single_cls=args.single_cls,
                              cache_images=args.cache_images)
    img_w = None
    if args.image_weights:
        counts = np.concatenate([lab[:, 0] for lab in train_ds.labels
                                 if len(lab)] or [np.zeros(1)])
        cls_w = np.bincount(counts.astype(int), minlength=nc).astype(float)
        cls_w = (1.0 / np.maximum(cls_w, 1)) ** 0.5
        img_w = train_ds.image_weights(cls_w)
    # shuffle=not rect (yolov3/train.py:185: rect fixes the AR-sorted
    # order so every batch keeps its planned bucket shape)
    train_loader = DetectionBatchLoader(train_ds, bs,
                                        shuffle=not args.rect,
                                        drop_last=True,
                                        num_workers=args.num_workers,
                                        seed=args.seed,
                                        image_weights=img_w)
    val_loader = DetectionBatchLoader(val_ds, bs,
                                      num_workers=args.num_workers)

    is_v5 = args.cfg.endswith((".yaml", ".yml"))
    # intersect: shape-tolerant pretrained load, so e.g. a COCO v5s.pt
    # seeds an nc=2 model's backbone (yolov5/train.py:82-92)
    model, variables = load_weights_for_cfg(args.cfg, args.weights,
                                            args.img_size,
                                            num_classes=nc if is_v5 else None,
                                            intersect=is_v5
                                            and bool(args.weights))
    from rtdm_tpu.export.detector import model_heads
    heads = model_heads(model, variables)
    if heads[0].num_classes != nc:
        # darknet cfgs bake nc into [yolo] blocks and head filter counts —
        # a mismatch (e.g. --single-cls with a 2-class cfg) cannot be
        # patched at runtime the way a yaml's nc can
        raise SystemExit(
            f"model has {heads[0].num_classes} classes but the run wants "
            f"{nc} (data cfg classes={nc_data}"
            + (", --single-cls" if args.single_cls else "")
            + "); use a matching cfg/yaml")
    if is_v5:
        # ultralytics loss + hyp.scratch defaults (yolov5/data/hyp.scratch.yaml)
        hyp = YoloHypV5(
            box=hyp_file.get("box", 0.05),
            cls=hyp_file.get("cls", 0.5),
            cls_pw=hyp_file.get("cls_pw", 1.0),
            obj=hyp_file.get("obj", 1.0),
            obj_pw=hyp_file.get("obj_pw", 1.0),
            anchor_t=hyp_file.get("anchor_t", 4.0),
            # CLI flag overrides the hyp file (yolov5/train.py:228)
            label_smoothing=(args.label_smoothing
                             if args.label_smoothing is not None
                             else hyp_file.get("label_smoothing", 0.0)),
            fl_gamma=(args.fl_gamma if args.fl_gamma is not None
                      else hyp_file.get("fl_gamma", 0.0)))
        from rtdm_tpu.train.yolo_loss import scale_v5_gains
        hyp = scale_v5_gains(hyp, nl=len(heads), nc=nc,
                             img_size=args.img_size)
        loss_impl = yolo_loss_v5
    else:
        hyp = YoloHyp(giou=args.giou_gain, cls=args.cls_gain,
                      obj=args.obj_gain, iou_t=args.iou_t,
                      # BCE positive weights ride the hyp yaml (the v3
                      # genome evolves them, yolov3/train.py:29/:31)
                      cls_pw=float(hyp_file.get("cls_pw", 1.0)),
                      obj_pw=float(hyp_file.get("obj_pw", 1.0)),
                      fl_gamma=args.fl_gamma if args.fl_gamma is not None
                      else 1.5)
        loss_impl = yolo_loss

    if is_v5 and not args.noautoanchor:
        # train-start anchor check (yolov5/train.py:213-216): when the
        # yaml anchors' best-possible-recall over this dataset's labels is
        # < 0.98, evolve a better set and use it for the whole run. The
        # reference persists evolved anchors inside its .pt checkpoint; the
        # analogue here is an updated arch yaml written next to the run —
        # point later yolo_test/yolo_detect calls at it.
        from rtdm_tpu.models.yolov5 import parse_v5_yaml
        from rtdm_tpu.train.autoanchor import (check_anchor_order,
                                               check_anchors)
        apx = np.stack([h.anchors_px for h in heads])
        new_a, bpr, evolved = check_anchors(train_ds, apx, args.img_size,
                                            thr=float(hyp.anchor_t))
        if evolved:
            new_a = check_anchor_order(new_a.reshape(apx.shape))
            for h, a in zip(heads, new_a):
                h.anchors_px = np.asarray(a, np.float32)
            os.makedirs(args.output, exist_ok=True)
            import yaml as _yaml
            d = parse_v5_yaml(model.yaml_text, nc)
            d["anchors"] = [[float(x) for x in lv.reshape(-1)]
                            for lv in new_a]
            anchor_yaml = os.path.join(args.output, "model-autoanchor.yaml")
            with open(anchor_yaml, "w") as f:
                _yaml.safe_dump(d, f)
            logging.info("autoanchor: BPR %.3f < 0.98 -> evolved anchors; "
                         "updated yaml saved to %s", bpr, anchor_yaml)
        else:
            logging.info("autoanchor: BPR %.3f, current anchors fit", bpr)

    steps_per_epoch = max(len(train_loader), 1)
    total_steps = steps_per_epoch * args.epochs
    from rtdm_tpu.train.schedules import kernel_only_mask
    if is_v5:
        # per-batch warmup interpolation (yolov5/train.py:281-290): over the
        # first nw batches bias lr FALLS from warmup_bias_lr to the cosine
        # value while every other lr RISES from 0, and SGD momentum ramps
        # warmup_momentum -> momentum. (The reference also ramps the
        # accumulate count; ours is baked into the compiled step, so the
        # effective-batch ramp is intentionally omitted.)
        nw = int(max(round(hyp_file.get("warmup_epochs", 3.0)
                           * steps_per_epoch), 1000))
        nw = max(min(nw, total_steps // 2), 1)
        # final-lr factor: the v5 one_cycle runs lr0 -> lr0*hyp['lrf']
        # (train.py:135, hyp.scratch lrf 0.2); an explicit --lrf overrides
        # as a decade exponent like the darknet path
        v5_lrf = (10.0 ** args.lrf if args.lrf is not None
                  else float(hyp_file.get("lrf", 0.2)))
        if args.linear_lr:
            def base_sched(step):  # train.py:136-137 linear lf
                x = jnp.clip(step / total_steps, 0.0, 1.0)
                return args.lr0 * ((1.0 - x) * (1.0 - v5_lrf) + v5_lrf)
        else:
            base_sched = optax.cosine_decay_schedule(
                args.lr0, total_steps, alpha=v5_lrf)
        warm_bias_lr = float(hyp_file.get("warmup_bias_lr", 0.1))
        warm_mom = float(hyp_file.get("warmup_momentum", 0.8))

        def _warm(step, y0, y1_fn):
            w = jnp.clip(step / nw, 0.0, 1.0)
            return (1.0 - w) * y0 + w * y1_fn(step)

        def bias_lr(step):
            return _warm(step, warm_bias_lr, base_sched)

        def rest_lr(step):
            return _warm(step, 0.0, base_sched)

        def momentum_sched(step):
            return _warm(step, warm_mom, lambda _: args.momentum)

        def bias_mask(params):
            def walk(tree):
                return {k: (walk(v) if isinstance(v, dict) else k == "bias")
                        for k, v in tree.items()}
            return walk(params)

        def rest_mask(params):
            return jax.tree_util.tree_map(lambda m: not m,
                                          bias_mask(params))

        if args.optimizer == "sgd":
            sgd_inj = optax.inject_hyperparams(
                optax.sgd, static_args=("nesterov",))
            inner_bias = sgd_inj(learning_rate=bias_lr,
                                 momentum=momentum_sched, nesterov=True)
            inner_rest = sgd_inj(learning_rate=rest_lr,
                                 momentum=momentum_sched, nesterov=True)
        else:
            inner_bias = optax.adam(bias_lr)
            inner_rest = optax.adam(rest_lr)
        # two complementary masked chains: each leaf is transformed exactly
        # once; the other mask passes the already-transformed update through
        tx = optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.add_decayed_weights(args.weight_decay,
                                      mask=kernel_only_mask),
            optax.masked(inner_bias, bias_mask),
            optax.masked(inner_rest, rest_mask))
    else:
        cosine = optax.cosine_decay_schedule(
            args.lr0, max(total_steps - args.burn_in, 1),
            alpha=10.0 ** (args.lrf if args.lrf is not None else -4.0))
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, args.lr0, max(args.burn_in, 1)),
             cosine],
            [max(args.burn_in, 1)])
        if args.optimizer == "sgd":
            tx = optax.chain(
                optax.clip_by_global_norm(10.0),
                optax.add_decayed_weights(args.weight_decay,
                                          mask=kernel_only_mask),
                optax.sgd(schedule, momentum=args.momentum, nesterov=True))
        else:
            tx = optax.chain(optax.clip_by_global_norm(10.0),
                             optax.adamw(schedule,
                                         weight_decay=args.weight_decay,
                                         mask=kernel_only_mask))

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))

    def head_bias_mask(params):
        """True only for the detection-output convs' biases."""
        from rtdm_tpu.models.yolov5 import YoloV5

        if isinstance(model, YoloV5):
            head_names = {k for k in params
                          if "_m" in k and k.split("_")[0][1:].isdigit()}
        else:
            from rtdm_tpu.models.darknet import parse_darknet_cfg
            defs = parse_darknet_cfg(model.cfg_text)[1:]
            head_names = {f"l{i - 1}_conv" for i, d in enumerate(defs)
                          if d["type"] == "yolo"}

        def walk(tree, top=None):
            return {k: (walk(v, top if top is not None else k)
                        if isinstance(v, dict)
                        else (k == "bias" and (top or "") in head_names))
                    for k, v in tree.items()}
        return walk(params)

    def inv_head_bias_mask(params):
        return jax.tree_util.tree_map(lambda m: not m,
                                      head_bias_mask(params))

    from rtdm_tpu.train.ema import ema_init, ema_update

    def make_step(train_size, txx=None, update_bn: bool = True):
        """Jitted train step at a fixed (possibly rescaled) image size.

        Multi-scale training = one compiled step per size: the loader
        always yields --img-size batches; sizes != base are resized on
        device with labels scaled to match (yolov3/train.py:269-275).

        Rect training = `train_size` is an (h, w) bucket shape: the
        loader already letterboxed the batch to it, so the step skips
        the device resize and the loss sees img_size=max(h, w) (the
        per-head stride is uniform, so the larger axis fixes it).

        update_bn=False freezes the BN running stats (the 200-batch BN
        burn-in, yolov3/train.py:250-255: track_running_stats off until
        ni == n_burn; batch statistics still normalize the forward).

        Logs before tracing: the first compile of the fused step costs
        minutes over the remote-compile tunnel and would otherwise look
        like a hang (the round-3 soak surfaced exactly this).

        The EMA update (ModelEMA, torch_utils.py:276-306) is folded INTO
        the jitted program when --ema is on — no per-step host dispatch."""
        rect_shape = isinstance(train_size, tuple)
        loss_size = max(train_size) if rect_shape else train_size
        ratio = 1.0 if rect_shape else train_size / args.img_size
        resize_to = None if (rect_shape or train_size == args.img_size) \
            else train_size
        txx = txx if txx is not None else tx

        def loss_fn(params, batch_stats, images, labels, nlab, rng):
            x = images.astype(dtype) / 255.0
            raw, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"], rngs={"dropout": rng})
            loss, comps = loss_impl(raw, heads, labels, nlab, loss_size,
                                    hyp)
            return loss, (mutated["batch_stats"], comps)

        def step(params, batch_stats, opt_state, ema, images, labels, nlab,
                 rng, step_i):
            if resize_to is not None:
                images = jax.image.resize(
                    images.astype(jnp.float32),
                    (images.shape[0], resize_to, resize_to,
                     images.shape[3]), method="bilinear")
                labels = labels.at[..., 1:5].multiply(ratio)
            mb_i = images.reshape((accumulate, -1) + images.shape[1:])
            mb_l = labels.reshape((accumulate, -1) + labels.shape[1:])
            mb_n = nlab.reshape((accumulate, -1))

            def body(carry, mb):
                stats, gsum, lsum, comp_sum, k = carry
                im, lb, nl = mb
                (loss, (stats, comps)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, stats, im, lb, nl,
                                           jax.random.fold_in(rng, k))
                gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                comp_vec = jnp.stack([comps["box"], comps["obj"],
                                      comps["cls"]])
                return (stats, gsum, lsum + loss, comp_sum + comp_vec,
                        k + 1), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            (new_stats, grads, loss, comps, _), _ = jax.lax.scan(
                body, (batch_stats, zeros, jnp.zeros(()), jnp.zeros((3,)),
                       jnp.zeros((), jnp.int32)), (mb_i, mb_l, mb_n))
            grads = jax.tree_util.tree_map(lambda g: g / accumulate, grads)
            updates, opt_state = txx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            new_stats = new_stats if update_bn else batch_stats
            if args.ema:
                ema = ema_update(ema, {"params": params,
                                       "batch_stats": new_stats}, step_i)
            return params, new_stats, opt_state, ema, loss / accumulate, \
                comps / accumulate

        logger.info("building train step for size %s%s (XLA compiles it "
                    "on first use — minutes over a remote-compile "
                    "backend)", train_size,
                    "" if update_bn else " [BN burn-in variant]")
        return jax.jit(
            step,
            in_shardings=(repl, repl, repl, repl, dsh, dsh, dsh, repl,
                          repl),
            out_shardings=repl, donate_argnums=(0, 1, 2, 3))

    def shape_dispatch(**mk_kwargs):
        """Rect-mode step dispatcher: one compiled program per distinct
        (h, w) bucket in the rect plan (a handful — ARs cluster),
        compiled lazily on first touch and reused across epochs."""
        cache = {}

        def dispatch(*step_args):
            key = tuple(int(x) for x in step_args[4].shape[1:3])
            if key not in cache:
                cache[key] = make_step(key, **mk_kwargs)
            return cache[key](*step_args)
        return dispatch

    # rect runs never touch the square program — compile lazily
    steps_by_size = ({} if args.rect
                     else {args.img_size: make_step(args.img_size)})

    n_burn = (args.bn_burn_in if args.bn_burn_in is not None
              else (0 if is_v5 else 200))
    burn_step = None  # built after the multi-scale dispatch (it must
    #                   draw sizes too — ref applies burn-in AND
    #                   multi-scale together, train.py:250-275)

    prebias_step = None
    prebias_tx = None
    if args.prebias > 0:
        # NOTE: optax.masked passes unmasked grads through as raw updates
        # (gradient ASCENT on everything else) — the complement must be
        # explicitly zeroed with set_to_zero.
        prebias_tx = optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.masked(optax.sgd(0.01, momentum=0.9), head_bias_mask),
            optax.masked(optax.set_to_zero(), inv_head_bias_mask))
        prebias_step = (shape_dispatch(txx=prebias_tx) if args.rect
                        else make_step(args.img_size, txx=prebias_tx))

    if args.rect:
        train_step = shape_dispatch()
        if n_burn > 0:
            burn_step = shape_dispatch(update_bn=False)
    elif args.multi_scale:
        # 67-150% of img-size in stride-32 steps (yolov3/train.py:269-275)
        gs = 32
        sizes = sorted({max(round(args.img_size * s / gs) * gs, gs)
                        for s in (0.67, 0.83, 1.0, 1.17, 1.5)})
        size_rng = np.random.default_rng(args.seed + 7)

        def train_step(*step_args):
            sz = int(size_rng.choice(sizes))
            if sz not in steps_by_size:
                steps_by_size[sz] = make_step(sz)
            return steps_by_size[sz](*step_args)

        if n_burn > 0:
            burn_by_size = {}

            def burn_step(*step_args):
                sz = int(size_rng.choice(sizes))
                if sz not in burn_by_size:
                    burn_by_size[sz] = make_step(sz, update_bn=False)
                return burn_by_size[sz](*step_args)
    else:
        train_step = steps_by_size[args.img_size]
        if n_burn > 0:
            burn_step = make_step(args.img_size, update_bn=False)

    @jax.jit
    def eval_step(params, batch_stats, images):
        x = images.astype(dtype) / 255.0
        raw = model.apply({"params": params, "batch_stats": batch_stats},
                          x, train=False)
        pred = decode_all(raw, heads, args.img_size)
        return batched_nms(pred, 0.001, 0.6, 300, 512, multi_label=True)

    # EMA rides inside the jitted step; {} is the leafless placeholder tree
    ema_vars = (ema_init({"params": params, "batch_stats": batch_stats})
                if args.ema else {})

    os.makedirs(args.output, exist_ok=True)
    from rtdm_tpu.train.checkpoint import CheckpointManager
    from rtdm_tpu.utils.experiment_log import ExperimentLogger
    explog = ExperimentLogger(args.output, run_name="yolo",
                              config=vars(args))
    results_path = os.path.join(args.output, "results.txt")
    names = list(dcfg.get("names") or [])
    if not args.no_plots:
        # label-distribution panel at train start (plot_labels,
        # yolov5/utils/plots.py:285, called from train.py:226)
        from rtdm_tpu.utils.plots import plot_label_distribution
        rows = np.concatenate([lab for lab in train_ds.labels if len(lab)]
                              or [np.zeros((0, 5), np.float32)])
        plot_label_distribution(rows, os.path.join(args.output,
                                                   "labels.png"), names)
    rng = jax.random.key(args.seed)
    ckpt_mgr = CheckpointManager(args.output)
    best_fitness = -1.0
    start_epoch = 0
    it = 0
    history = []
    prebias_opt_state = None
    if args.resume:
        # full-state resume (yolov3/train.py:352-356,427: {epoch,
        # best_fitness, model, optimizer}; v5 adds EMA, train.py:148-171)
        if not ckpt_mgr.exists("last_state"):
            raise SystemExit(f"--resume: no checkpoint at "
                             f"{os.path.join(args.output, 'last_state')}")
        template = {"params": params, "batch_stats": batch_stats,
                    "opt_state": opt_state, "ema": ema_vars}
        state, meta = ckpt_mgr.restore("last_state", template)
        params, batch_stats = state["params"], state["batch_stats"]
        opt_state, ema_vars = state["opt_state"], state["ema"]
        start_epoch = int(meta.get("epoch", -1)) + 1
        it = int(meta.get("it", 0))
        best_fitness = float(meta.get("best_fitness", -1.0))
        history = list(meta.get("history", []))
        logger.info("resumed at epoch %d (it %d, best_fitness %.4f)",
                    start_epoch, it, best_fitness)

    aborted = False
    # survive epochs == start_epoch / non-eval final epochs
    res, last_res, ep_loss = None, None, np.zeros(3)
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        ep_loss = np.zeros(3)
        nb = 0
        pending_comps = None  # one-step-lagged loss fetch (see below)
        in_prebias = prebias_step is not None and epoch < args.prebias
        if in_prebias and prebias_opt_state is None:
            prebias_opt_state = prebias_tx.init(params)
        for batch, valid in train_loader:
            if not args.no_plots and epoch == start_epoch and nb < 3:
                # train_batch{0..2}.jpg mosaics (plot_images,
                # yolov5/train.py:299-303)
                from rtdm_tpu.utils.plots import plot_detection_batch
                plot_detection_batch(
                    batch["image"], batch["labels"], batch["num_labels"],
                    os.path.join(args.output, f"train_batch{nb}.jpg"),
                    names)
            images = jax.device_put(jnp.asarray(batch["image"]), dsh)
            labels = jax.device_put(jnp.asarray(batch["labels"]), dsh)
            nlab = jax.device_put(jnp.asarray(batch["num_labels"]), dsh)
            step_i = jnp.asarray(it, jnp.int32)
            step_rng = jax.random.fold_in(rng, it)
            if in_prebias:
                params, batch_stats, prebias_opt_state, ema_vars, loss, \
                    comps = prebias_step(
                        params, batch_stats, prebias_opt_state, ema_vars,
                        images, labels, nlab, step_rng, step_i)
            else:
                fn = (burn_step if burn_step is not None and it < n_burn
                      else train_step)
                params, batch_stats, opt_state, ema_vars, loss, comps = fn(
                    params, batch_stats, opt_state, ema_vars,
                    images, labels, nlab, step_rng, step_i)
            # Pipelined loss fetch: check step N-1's components while step
            # N is already dispatched (jax dispatch is async). A same-step
            # device_get would serialize every step on a full tunnel
            # round-trip — measured ~25 s/epoch on the remote-compile
            # backend vs ~10 s pipelined. The non-finite abort
            # (yolov3/train.py:284-286) still fires, one step late.
            if pending_comps is not None:
                comps_np = np.asarray(jax.device_get(pending_comps))
                if not np.isfinite(comps_np).all():
                    logger.error(
                        "WARNING: non-finite loss %s at step %d — ending "
                        "training", comps_np.tolist(), it - 1)
                    aborted = True
                    break
                ep_loss += comps_np
            pending_comps = comps
            nb += 1
            it += 1
        # drain the last step's lagged components
        if pending_comps is not None and not aborted:
            comps_np = np.asarray(jax.device_get(pending_comps))
            if not np.isfinite(comps_np).all():
                logger.error("WARNING: non-finite loss %s at final step %d",
                             comps_np.tolist(), it - 1)
                aborted = True
            else:
                ep_loss += comps_np
            pending_comps = None
        if aborted:
            break
        ep_loss /= max(nb, 1)

        line = (f"epoch {epoch + 1}/{args.epochs} "
                f"box {ep_loss[0]:.4f} obj {ep_loss[1]:.4f} "
                f"cls {ep_loss[2]:.4f} {time.time() - t0:.1f}s")
        res = None
        if ((args.eval_every > 0 and (epoch + 1) % args.eval_every == 0)
                or epoch == args.epochs - 1):
            # evaluate with the EMA weights when enabled — how ModelEMA is
            # consumed at test time (yolov5/train.py:346+)
            ev_params, ev_stats = ((ema_vars["params"],
                                    ema_vars["batch_stats"])
                                   if args.ema else (params, batch_stats))
            # v5 selects best by 0.1*mAP@.5 + 0.9*mAP@.5:.95, so its
            # per-epoch eval needs the full IoU vector (yolov5/test.py:53);
            # darknet fitness only reads mAP@0.5 (yolov3/test.py:53-54)
            ev = DetectionEvaluator(
                nc, np.linspace(0.5, 0.95, 10) if is_v5
                else np.array([0.5]),
                family="v5" if is_v5 else "v3")
            for batch, valid in val_loader:
                det, count = jax.device_get(eval_step(
                    ev_params, ev_stats, jnp.asarray(batch["image"])))
                for i in range(valid):
                    n = int(count[i])
                    nl = int(batch["num_labels"][i])
                    lab = batch["labels"][i][:nl]
                    gt = np.asarray(xywh_to_xyxy(jnp.asarray(lab[:, 1:5])))
                    ev.add_image(det[i][:n], gt, lab[:, 0].astype(np.int32))
            res = ev.results()
            f1 = (2 * res["mp"] * res["mr"]
                  / max(res["mp"] + res["mr"], 1e-9))
            fitness = (float(np.dot(FITNESS_W_V5,
                                    [res["mp"], res["mr"], res["map50"],
                                     res["map"]]))
                       if is_v5 else
                       float(np.dot(FITNESS_W,
                                    [res["mp"], res["mr"], res["map50"],
                                     f1])))
            line += (f" | P {res['mp']:.3f} R {res['mr']:.3f} "
                     f"mAP@0.5 {res['map50']:.3f}")
            # --nosave: weights land only on the final epoch
            # (yolov5/train.py:361 'not nosave or final_epoch')
            if not args.nosave or epoch == args.epochs - 1:
                var_now = (jax.device_get(ema_vars) if args.ema
                           else {"params": jax.device_get(params),
                                 "batch_stats": jax.device_get(batch_stats)})
                save_variables(os.path.join(args.output, "last.npz"),
                               var_now)
                if fitness > best_fitness:
                    save_variables(os.path.join(args.output, "best.npz"),
                                   var_now)
            best_fitness = max(best_fitness, fitness)
        logger.info(line)
        if res is not None:
            last_res = res  # most recent eval survives non-eval epochs
        scalars = {"box": float(ep_loss[0]), "obj": float(ep_loss[1]),
                   "cls": float(ep_loss[2])}
        if res is not None:
            scalars.update({"precision": res["mp"], "recall": res["mr"],
                            "map50": res["map50"]})
            if is_v5:
                scalars["map"] = res["map"]
        explog.log_scalars(epoch, scalars)
        with open(results_path, "a") as f:
            f.write(line + "\n")
        history.append({"loss": ep_loss.tolist(),
                        "map50": None if res is None else res["map50"],
                        "map": None if (res is None or not is_v5)
                        else res["map"]})
        if args.save_period > 0 and (epoch + 1) % args.save_period == 0:
            # periodic weight backups (yolov3/train.py:368-369 backup%g.pt;
            # yolov5 --save_period epoch_{n}.pt) — EMA weights when enabled,
            # same choice the per-epoch last.npz makes
            bk = (jax.device_get(ema_vars) if args.ema
                  else {"params": jax.device_get(params),
                        "batch_stats": jax.device_get(batch_stats)})
            save_variables(
                os.path.join(args.output, f"backup{epoch + 1}.npz"), bk)
        # full-state checkpoint for --resume ({epoch, best_fitness, model,
        # optimizer(+EMA)}, yolov3/train.py:352-356 / yolov5:148-171)
        if ((epoch + 1) % max(args.ckpt_every, 1) == 0 and not args.nosave) \
                or epoch == args.epochs - 1:
            ckpt_mgr.save("last_state",
                          {"params": params, "batch_stats": batch_stats,
                           "opt_state": opt_state, "ema": ema_vars},
                          metadata={"epoch": epoch, "it": it,
                                    "best_fitness": best_fitness,
                                    "history": history})
    if not aborted and not args.no_strip and ckpt_mgr.exists("last_state"):
        # strip_optimizer finalize (yolov5/utils/general.py:587): a
        # completed run keeps only the deployable weight npz artifacts
        import shutil
        shutil.rmtree(os.path.join(args.output, "last_state"),
                      ignore_errors=True)
        meta_f = os.path.join(args.output, "last_state.meta.json")
        if os.path.exists(meta_f):
            os.remove(meta_f)
        logger.info("optimizer state stripped; best.npz/last.npz keep the "
                    "deployable weights")
    if not args.no_plots and os.path.exists(results_path):
        # results.png curves at run end (plot_results, yolov5/train.py:398)
        from rtdm_tpu.utils.plots import plot_detector_results
        plot_detector_results(results_path,
                              os.path.join(args.output, "results.png"))
    return {"params": params, "batch_stats": batch_stats,
            "history": history, "best_fitness": best_fitness,
            # final-epoch eval metrics + train losses: the evolve flow
            # writes these as its evolve.txt result columns
            # (print_mutation's `results`, yolov5/utils/general.py:607)
            "last_eval": last_res,
            "last_loss": [float(v) for v in ep_loss[:3]]}


# Gene -> argparse-flag routing: these genes are trainer FLAGS; every
# other gene rides the per-generation hyp yaml (--hyp), which is how the
# reference's yaml-driven genes reach train() too (yolov5/train.py:543).
V3_GENE_FLAGS = {"giou": "giou_gain", "cls": "cls_gain", "obj": "obj_gain",
                 "iou_t": "iou_t", "lr0": "lr0", "lrf": "lrf",
                 "momentum": "momentum", "weight_decay": "weight_decay",
                 "fl_gamma": "fl_gamma"}
V5_GENE_FLAGS = {"lr0": "lr0", "momentum": "momentum",
                 "weight_decay": "weight_decay"}

# Seed values for genes not supplied via --hyp or flags:
# v3 = yolov3/train.py:27-44 hyp dict; v5 = data/hyp.scratch.yaml.
V3_GENE_DEFAULTS = {
    "giou": 1.0, "cls": 37.4, "cls_pw": 1.0, "obj": 64.3, "obj_pw": 1.0,
    "iou_t": 0.3, "lr0": 0.001, "lrf": -4.0, "momentum": 0.637,
    "weight_decay": 0.000084, "fl_gamma": 1.5, "hsv_h": 0.0138,
    "hsv_s": 0.678, "hsv_v": 0.36, "degrees": 0.0, "translate": 0.0,
    "scale": 0.0, "shear": 0.0,
}
V5_GENE_DEFAULTS = {
    "lr0": 0.01, "lrf": 0.2, "momentum": 0.937, "weight_decay": 0.0005,
    "warmup_epochs": 3.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1,
    "box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0, "obj_pw": 1.0,
    "iou_t": 0.2, "anchor_t": 4.0, "fl_gamma": 0.0, "hsv_h": 0.015,
    "hsv_s": 0.7, "hsv_v": 0.4, "degrees": 0.0, "translate": 0.1,
    "scale": 0.5, "shear": 0.0, "fliplr": 0.5, "mosaic": 1.0, "mixup": 0.0,
}


def evolve(args):
    """Reference-faithful hyperparameter evolution.

    Drives train/evolve.py's kernel: weighted top-n parent selection +
    per-gene (gain, lo, hi) method-3 mutation (yolov3/train.py:444-491,
    yolov5/train.py:583-612), with evolve.txt kept unique+sorted by
    fitness and the best row saved as hyp_evolved.yaml
    (yolov5/utils/general.py:603-627 print_mutation). Generation 0
    evaluates the seed hyp (evolve.txt doesn't exist yet -> no mutation,
    matching the reference's `if Path('evolve.txt').exists()` guard).
    Deviation: the three loss columns in evolve.txt are final-epoch TRAIN
    losses (this trainer doesn't compute val losses); fitness only reads
    the first 4 metric columns, so selection is unaffected.
    """
    import numpy as np

    from rtdm_tpu.train.evolve import (EvolveLog, FITNESS_W_V3,
                                       FITNESS_W_V5, V3_EVOLVE_META,
                                       V5_EVOLVE_META)
    from rtdm_tpu.train.evolve import fitness as fitness_of
    from rtdm_tpu.train.evolve import mutate, select_parent

    rng = np.random.default_rng(args.seed)
    is_v5 = args.cfg.endswith((".yaml", ".yml"))
    meta = V5_EVOLVE_META if is_v5 else V3_EVOLVE_META
    w_fit = FITNESS_W_V5 if is_v5 else FITNESS_W_V3
    # mutation probability: yolov5/train.py:599 mp=0.8; yolov3:464 mp=0.9
    mut_p = 0.8 if is_v5 else 0.9
    flags = V5_GENE_FLAGS if is_v5 else V3_GENE_FLAGS
    defaults = V5_GENE_DEFAULTS if is_v5 else V3_GENE_DEFAULTS
    hyp_file = {}
    if args.hyp:
        import yaml as _yaml
        with open(args.hyp) as f:
            hyp_file = _yaml.safe_load(f) or {}

    def seed_of(k):
        if k in hyp_file:
            return float(hyp_file[k])
        if k in flags and getattr(args, flags[k]) is not None:
            return float(getattr(args, flags[k]))
        return float(defaults[k])

    base = {k: seed_of(k) for k in meta}
    os.makedirs(args.output, exist_ok=True)
    log = EvolveLog(os.path.join(args.output, "evolve.txt"), meta, w_fit)
    for g in range(args.evolve):
        rows = log.load()
        if rows is None:
            hyp = dict(base)
        else:
            parent = select_parent(rows, rng, w_fit=w_fit)
            hyp = mutate(log.genes_of(parent), meta, rng, mp=mut_p)
        trial = argparse.Namespace(**vars(args))
        trial.evolve = 0
        # reference evolve: opt.nosave = True (weights only at final
        # epoch, yolov5/train.py:577)
        trial.nosave = True
        trial.output = os.path.join(args.output, f"gen{g}")
        for k, flag in flags.items():
            setattr(trial, flag, hyp[k])
        import yaml as _yaml
        trial_hyp = dict(hyp_file)
        trial_hyp.update({k: hyp[k] for k in meta if k not in flags})
        hyp_path = os.path.join(args.output, f"gen{g}-hyp.yaml")
        with open(hyp_path, "w") as f:
            _yaml.safe_dump(trial_hyp, f, sort_keys=False)
        trial.hyp = hyp_path
        if is_v5:
            # yaml genes must rule: an explicit flag would override them
            # (train() precedence, see lines ~315/375)
            trial.fl_gamma = None
            trial.lrf = None
        result = train(trial)
        ev = result.get("last_eval") or {}
        p_, r_ = float(ev.get("mp", 0.0)), float(ev.get("mr", 0.0))
        map50 = float(ev.get("map50", 0.0))
        # 4th results column: mAP@0.5:0.95 for v5, F1 for v3 (the
        # families' test() result tuples)
        col4 = (float(ev.get("map", 0.0)) if is_v5
                else 2 * p_ * r_ / max(p_ + r_, 1e-9))
        losses = result.get("last_loss", [0.0, 0.0, 0.0])
        log.append(hyp, [p_, r_, map50, col4] + list(losses))
        logger.info("evolve gen %d: fitness %.5f", g, float(
            fitness_of(np.array([[p_, r_, map50, col4]]), w_fit)[0]))
    yaml_out = os.path.join(args.output, "hyp_evolved.yaml")
    log.save_yaml(yaml_out)
    best_hyp = log.best() or dict(base)
    rows = log.load()
    best_fit = (float(fitness_of(rows, w_fit).max())
                if rows is not None else -1.0)
    logger.info("evolved hyp -> %s (fitness %.5f): %s", yaml_out, best_fit,
                best_hyp)
    if not args.no_plots and os.path.exists(log.path):
        # fitness-vs-gene scatter (plot_evolution, yolov5/utils/plots.py:334)
        from rtdm_tpu.utils.plots import plot_evolution_results
        plot_evolution_results(log.path,
                               os.path.join(args.output, "evolve.png"),
                               keys=list(meta), w_fit=w_fit)
    return best_hyp, best_fit


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(message)s")
    args = parse_args(argv)
    from rtdm_tpu.utils.checks import check_img_size
    args.img_size = check_img_size(args.img_size)
    if args.summary:
        from rtdm_tpu.utils.summary import summarize_detector
        print(summarize_detector(args.cfg, args.img_size))
        return None
    if not args.data:
        raise SystemExit("--data is required (unless --summary)")
    if args.evolve:
        return evolve(args)
    return train(args)


if __name__ == "__main__":
    main()
