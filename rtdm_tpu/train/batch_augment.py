"""Device-side batch augmentation: mixup + cutmix for classification.

The reference's TrainingConfig carries mixup_alpha/cutmix_alpha knobs
(training_utils/config.py:56-57) that its loop never consumes; here they
are functional. Runs INSIDE the jitted train step (pure jnp, fixed
shapes): images blend with a permuted batch, the loss becomes
lam*L(y) + (1-lam)*L(y_perm).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mixup_batch(rng: jax.Array, images: jax.Array, alpha: float
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (mixed_images, perm, lam)."""
    k1, k2 = jax.random.split(rng)
    lam = jax.random.beta(k1, alpha, alpha)
    perm = jax.random.permutation(k2, images.shape[0])
    mixed = lam * images + (1.0 - lam) * images[perm]
    return mixed.astype(images.dtype), perm, lam


def cutmix_batch(rng: jax.Array, images: jax.Array, alpha: float
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Random box from a permuted batch; lam = 1 - box_area/image_area."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    b, h, w, _ = images.shape
    lam0 = jax.random.beta(k1, alpha, alpha)
    cut = jnp.sqrt(1.0 - lam0)
    ch, cw = (h * cut).astype(jnp.int32), (w * cut).astype(jnp.int32)
    cy = jax.random.randint(k2, (), 0, h)
    cx = jax.random.randint(k3, (), 0, w)
    y1 = jnp.clip(cy - ch // 2, 0, h)
    y2 = jnp.clip(cy + ch // 2, 0, h)
    x1 = jnp.clip(cx - cw // 2, 0, w)
    x2 = jnp.clip(cx + cw // 2, 0, w)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    box = ((yy >= y1) & (yy < y2) & (xx >= x1) & (xx < x2))[None, :, :, None]
    perm = jax.random.permutation(k4, b)  # own key: the cut position and
    # the pairing permutation must be independent draws
    mixed = jnp.where(box, images[perm], images)
    lam = 1.0 - ((y2 - y1) * (x2 - x1)) / (h * w)
    return mixed.astype(images.dtype), perm, lam.astype(jnp.float32)
