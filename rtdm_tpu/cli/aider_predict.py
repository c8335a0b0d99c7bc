"""Single-image AIDER prediction CLI.

Parity with the reference's aider-predict.py:47-178: load an image, apply
the eval transform (resize 1.14x short side, center crop, ImageNet
normalize), run the classifier, print class + softmax confidence; optional
visualization PNG. `--engine` loads a serialized rtdm_tpu engine (the
torch2trt TRTModule analogue, export/engine.py) instead of raw weights.

Run: python -m rtdm_tpu.cli.aider_predict --image x.jpg \
         --weights saves/squeeze-ernet.npz (or a torch .pt) --model squeeze-ernet
"""

from __future__ import annotations

import argparse
import sys
import time


def load_image_rgb(path: str):
    import numpy as np
    from PIL import Image
    with open(path, "rb") as f:
        return np.asarray(Image.open(f).convert("RGB"), np.uint8)


def preprocess(arr, size: int):
    """Eval transform on a HWC uint8 array -> (1,size,size,3) uint8."""
    import numpy as np
    from PIL import Image
    img = Image.fromarray(arr)
    w, h = img.size
    target = int(size * 1.14)
    if w <= h:
        nw, nh = target, max(int(round(h * target / w)), target)
    else:
        nh, nw = target, max(int(round(w * target / h)), target)
    img = img.resize((nw, nh), Image.BILINEAR)
    left, top = (nw - size) // 2, (nh - size) // 2
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img, np.uint8)[None]


def predict(variables, model, image_u8):
    import jax
    import jax.numpy as jnp
    from rtdm_tpu.data.aider import normalize_batch

    @jax.jit
    def fwd(v, u8):
        return model.apply(v, normalize_batch(u8), train=False)

    probs = fwd(variables, jnp.asarray(image_u8))
    import numpy as np
    probs = np.asarray(probs)[0]
    return int(np.argmax(probs)), probs


def main(argv=None):
    p = argparse.ArgumentParser(description="AIDER single-image prediction")
    p.add_argument("--image", required=True)
    p.add_argument("--model", default="squeeze-ernet",
                   choices=["ernet", "squeeze-ernet", "squeeze-redconv"])
    p.add_argument("--weights", help="weights: our .npz or torch .pt state_dict")
    p.add_argument("--engine", help="serialized rtdm_tpu engine dir")
    p.add_argument("--quant", default=None,
                   choices=["fp32", "bf16", "fp16", "int8"],
                   help="with --weights: build an in-memory engine at this "
                        "precision and predict through it (the --trt "
                        "--quant path, aider-predict.py:36-41,90-96); "
                        "with --engine: assert the engine matches")
    p.add_argument("--compare-engine",
                   help="ALSO run this engine and print both predictions "
                        "side by side (aider-predict.py --trt comparison)")
    p.add_argument("--visualize", help="write annotated PNG here")
    args = p.parse_args(argv)
    if not args.engine and not args.weights:
        p.error("--weights is required unless --engine is given")

    from rtdm_tpu.models import create_model
    from rtdm_tpu.models.ernet import CLASS_NAMES

    model = create_model(args.model)
    size = model.image_size
    image = preprocess(load_image_rgb(args.image), size)

    if args.engine:
        from rtdm_tpu.export.engine import Engine
        engine = Engine.load(args.engine)
        norm = {"fp16": "bf16", "half": "bf16"}
        if args.quant and engine.spec.normalized_quant() != \
                norm.get(args.quant, args.quant):
            raise SystemExit(
                f"--quant {args.quant} does not match the engine's "
                f"precision ({engine.spec.quant}) — pass the matching "
                f"engine dir (reference loads model_trt_<quant>.pth)")
        t0 = time.time()
        probs = engine(image)[0]
        dt = time.time() - t0
        import numpy as np
        probs = np.asarray(probs, dtype=np.float32)
        idx = int(np.argmax(probs))
    elif args.quant:
        # --trt --quant analogue without a prebuilt engine: convert the
        # raw weights to an engine at the requested precision in-process
        # (aider-predict.py:36-41 loads the torch2trt module; here the
        # conversion is a fresh XLA compile, so it happens inline)
        import numpy as np
        from rtdm_tpu.export.engine import build_engine
        from rtdm_tpu.models.io import load_variables
        variables = load_variables(args.weights)
        calib = np.repeat(image, 8, axis=0) if args.quant == "int8" else None
        engine = build_engine(args.model, variables, quant=args.quant,
                              batch_size=1, calib_images=calib,
                              verify=False)
        t0 = time.time()
        probs = np.asarray(engine(image), np.float32)[0]
        dt = time.time() - t0
        idx = int(np.argmax(probs))
    else:
        from rtdm_tpu.models import with_checkpoint_head
        from rtdm_tpu.models.io import load_variables
        variables = load_variables(args.weights)
        model = with_checkpoint_head(model, variables)
        t0 = time.time()
        idx, probs = predict(variables, model, image)
        dt = time.time() - t0

    names = (CLASS_NAMES if len(probs) == len(CLASS_NAMES)
             else [f"class_{i}" for i in range(len(probs))])
    print(f"prediction: {names[idx]}  confidence: {probs[idx]:.4f}  "
          f"({dt * 1e3:.1f} ms incl. compile)")
    for i, name in enumerate(names):
        print(f"  {name:>20}: {probs[i]:.4f}")

    if args.compare_engine:
        import numpy as np
        from rtdm_tpu.export.engine import Engine
        eng = Engine.load(args.compare_engine)
        eprobs = np.asarray(eng(image), np.float32)[0]
        eidx = int(np.argmax(eprobs))
        agree = "AGREE" if eidx == idx else "DISAGREE"
        ename = (names[eidx] if eidx < len(names)
                 else f"class_{eidx}")  # engine may have a wider head
        delta = (f"{np.abs(eprobs - probs).max():.4f}"
                 if eprobs.shape == probs.shape else "n/a (class counts "
                 f"differ: {len(eprobs)} vs {len(probs)})")
        print(f"engine ({eng.spec.quant}): {ename} "
              f"{eprobs[eidx]:.4f}  [{agree}]  max prob delta {delta}")

    if args.visualize:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.imshow(image[0])
        ax.set_title(f"{CLASS_NAMES[idx]} ({probs[idx]:.2%})")
        ax.axis("off")
        fig.savefig(args.visualize, dpi=110, bbox_inches="tight")
        print(f"visualization written to {args.visualize}")
    return idx


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
