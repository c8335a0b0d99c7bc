"""Training-curve plots (reference: training_utils/metrics.py:8-64 —
loss/acc/F1/LR PNGs after training)."""

from __future__ import annotations

import os
from typing import Dict, Sequence


def plot_training_curves(history: Dict[str, Sequence[float]],
                         out_dir: str, prefix: str = "training") -> list:
    """history keys like train_loss/val_loss/train_acc/val_acc/val_f1/lr."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    written = []
    panels = [
        ("loss", ["train_loss", "val_loss"]),
        ("accuracy", ["train_acc", "val_acc"]),
        ("f1", ["val_f1"]),
        ("lr", ["lr"]),
    ]
    for name, keys in panels:
        keys = [k for k in keys if k in history and len(history[k])]
        if not keys:
            continue
        fig, ax = plt.subplots(figsize=(7, 4.5))
        for k in keys:
            ax.plot(history[k], label=k)
        ax.set_xlabel("epoch")
        ax.set_title(name)
        ax.legend()
        ax.grid(alpha=0.3)
        path = os.path.join(out_dir, f"{prefix}_{name}.png")
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
    return written
