"""Fused ACFF Pallas kernel vs the ops-based ACFF module (interpret mode
on CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtdm_tpu.models import create_model
from rtdm_tpu.models.acff import ACFF
from rtdm_tpu.ops.acff_pallas import (
    fused_acff_infer,
    fused_classifier_forward,
    pack_acff_params,
)


@pytest.mark.parametrize("c,out,hw", [(16, 64, 17), (64, 96, 9)])
def test_fused_acff_matches_module(rng, c, out, hw):
    acff = ACFF(out)
    x = jnp.asarray(rng.normal(size=(4, hw, hw, c)), jnp.float32)
    variables = acff.init(jax.random.key(0), x)
    # randomize BN stats so the affine fold is non-trivial
    variables = jax.device_get(variables)
    variables["batch_stats"]["batch_norm"]["mean"] = \
        rng.normal(size=(out,)).astype(np.float32) * 0.1
    variables["batch_stats"]["batch_norm"]["var"] = \
        rng.uniform(0.5, 1.5, (out,)).astype(np.float32)

    want = acff.apply(variables, x, train=False)

    args = pack_acff_params(variables["params"], variables["batch_stats"])
    got = fused_acff_infer(x, *args, batch_tile=2, interpret=True)
    assert got.shape == want.shape == (4, hw - 2, hw - 2, out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_classifier_forward_matches_model(rng):
    model = create_model("squeeze-ernet")
    x = jnp.asarray(rng.normal(size=(2, 140, 140, 3)), jnp.float32)
    variables = model.init(jax.random.key(1), x)
    want = model.apply(variables, x, train=False)

    fwd = fused_classifier_forward(model, jax.device_get(variables),
                                   interpret=True)
    got = fwd(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    assert np.array_equal(np.argmax(got, 1), np.argmax(want, 1))


def test_fused_redconv_forward_matches_model(rng):
    model = create_model("squeeze-redconv")
    x = jnp.asarray(rng.normal(size=(2, 140, 140, 3)), jnp.float32)
    variables = model.init(jax.random.key(2), x)
    want = model.apply(variables, x, train=False)
    fwd = fused_classifier_forward(model, jax.device_get(variables),
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(fwd(x)), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
