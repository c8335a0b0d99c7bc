"""ErNET-family model tests: shapes, parameter counts, and numerical parity
against the reference's shipped checkpoints executed via torch-functional."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtdm_tpu.models import create_model
from rtdm_tpu.models.torch_import import (
    classifier_variables_from_torch,
    load_torch_state_dict,
)
from tests.conftest import CLS_WEIGHTS, needs_reference

# Param totals from the reference model summaries
# (code/disaster_detection/model_summary/*.txt, tails).
EXPECTED_PARAMS = {
    "squeeze-ernet": 169_241,
    "squeeze-redconv": 109_569,
    "ernet": 276_118,
}

STATE_DICTS = {
    "squeeze-ernet": "squeeze-ernet-state_dict.pt",
    "squeeze-redconv": "squeeze-redconv-state_dict.pt",
    "ernet": "ernet-state_dict.pt",
}


def _init(name):
    model = create_model(name)
    size = model.image_size
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    return model, variables, size


@pytest.mark.parametrize("name", sorted(EXPECTED_PARAMS))
def test_param_count(name):
    _, variables, _ = _init(name)
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"]))
    assert n == EXPECTED_PARAMS[name]


@pytest.mark.parametrize("name", sorted(EXPECTED_PARAMS))
def test_output_shape_and_softmax(name):
    model, variables, size = _init(name)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, size, size, 3)),
                    jnp.float32)
    out = model.apply(variables, x)
    assert out.shape == (4, 5)
    np.testing.assert_allclose(np.sum(np.asarray(out), axis=1),
                               np.ones(4), rtol=1e-5)


@needs_reference
@pytest.mark.parametrize("name", sorted(STATE_DICTS))
def test_parity_vs_reference_weights(name, rng):
    import torch
    from tests import torch_ref

    sd = load_torch_state_dict(str(CLS_WEIGHTS / STATE_DICTS[name]))
    variables = classifier_variables_from_torch(sd)
    model = create_model(name)
    size = model.image_size

    x = rng.normal(size=(2, 3, size, size)).astype(np.float32)
    fwd = {"squeeze-ernet": torch_ref.squeeze_ernet_forward,
           "squeeze-redconv": torch_ref.squeeze_redconv_forward,
           "ernet": torch_ref.ernet_forward}[name]
    with torch.no_grad():
        expected = fwd(torch.from_numpy(x), sd).numpy()

    got = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got), expected,
                               rtol=1e-4, atol=1e-5)
    assert np.array_equal(np.argmax(got, axis=1), np.argmax(expected, axis=1))


def test_split_fuse_matches_concat_path():
    """split_fuse=True (concat-free ACFF 1x1, models/acff.py) must be
    numerically equivalent to the concat path under the SAME params —
    W @ concat(b1,b2,b3) == sum_i W_i @ b_i up to f32 accumulation order."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtdm_tpu.models import create_model

    base = create_model("squeeze-ernet")
    split = create_model("squeeze-ernet", split_fuse=True)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 140, 140, 3)).astype(np.float32))
    variables = base.init(jax.random.PRNGKey(0), x)
    y0 = base.apply(variables, x)
    y1 = split.apply(variables, x)  # identical param tree by construction
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)
