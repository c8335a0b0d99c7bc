"""Batch-in-channels packed inference (models/packed.py) parity tests.

The packed path is a pure layout transform — grouped convs over k images
folded into channels — so in f32 it must match the standard NHWC flax
forward to float-roundoff, per image, for every supported model and any
pack factor dividing the batch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtdm_tpu.data.aider import normalize_batch
from rtdm_tpu.models import create_model
from rtdm_tpu.models.packed import pack_images, packed_forward


def _init(name, size):
    model = create_model(name)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3), jnp.float32))
    return model, variables


@pytest.mark.parametrize("name,size", [("squeeze-ernet", 140),
                                       ("ernet", 240)])
@pytest.mark.parametrize("k", [2, 8])
@pytest.mark.parametrize("layout", ["grouped", "dense"])
def test_packed_matches_standard_f32(name, size, k, layout):
    model, variables = _init(name, size)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.integers(0, 255, (8, size, size, 3),
                                    dtype=np.uint8))
    ref = model.apply(variables, normalize_batch(imgs), train=False)
    got = packed_forward(variables, imgs, k=k, model=name, layout=layout,
                         compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-5)


def test_packed_bf16_agrees_on_reference_checkpoint_shapes():
    """bf16 packed vs bf16 standard: same argmax, probs within bf16 slop."""
    model, variables = _init("squeeze-ernet", 140)
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.integers(0, 255, (16, 140, 140, 3),
                                    dtype=np.uint8))
    ref = model.apply(variables, normalize_batch(imgs).astype(jnp.bfloat16),
                      train=False)
    got = packed_forward(variables, imgs, k=8, compute_dtype=jnp.bfloat16)
    assert (np.argmax(np.asarray(got), -1)
            == np.argmax(np.asarray(ref), -1)).all()
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 0.05


def test_pack_images_order():
    """Image j of block b lands in channel group j — row order preserved."""
    x = jnp.arange(4 * 2 * 2 * 3).reshape(4, 2, 2, 3).astype(jnp.float32)
    p = pack_images(x, 2)
    assert p.shape == (2, 2, 2, 6)
    np.testing.assert_array_equal(np.asarray(p[0, :, :, :3]),
                                  np.asarray(x[0]))
    np.testing.assert_array_equal(np.asarray(p[0, :, :, 3:]),
                                  np.asarray(x[1]))
    np.testing.assert_array_equal(np.asarray(p[1, :, :, 3:]),
                                  np.asarray(x[3]))


def test_packed_rejects_unsupported():
    _, variables = _init("squeeze-ernet", 140)
    imgs = jnp.zeros((4, 140, 140, 3), jnp.uint8)
    with pytest.raises(ValueError, match="redconv"):
        packed_forward(variables, imgs, k=2, model="squeeze-redconv")
