"""Total checkpoint parity: EVERY shipped classifier checkpoint (all 15
under code/disaster_detection/weights/, including the legacy full-module
pickles loaded via the aider-predict.py:36-41 path) must import and agree
with an independent torch-functional oracle on real aerial images."""

import glob
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtdm_tpu.models import create_model
from rtdm_tpu.models.torch_import import (
    classifier_variables_from_torch,
    infer_classifier_arch,
    load_torch_state_dict,
)
from tests.conftest import CLS_WEIGHTS, reference_available

EXAMPLES = pathlib.Path(__file__).resolve().parents[1] / "docs/examples"

ALL_CKPTS = (sorted(p.name for p in CLS_WEIGHTS.glob("*.pt"))
             if reference_available() else [])


def _real_batch(size: int) -> np.ndarray:
    from rtdm_tpu.cli.aider_predict import load_image_rgb, preprocess

    paths = sorted(glob.glob(str(EXAMPLES / "*.jpg")))[:4]
    assert paths, "docs/examples images missing"
    return np.concatenate([preprocess(load_image_rgb(p), size)
                           for p in paths])


def test_all_fifteen_checkpoints_present():
    if not reference_available():
        pytest.skip("reference not mounted")
    assert len(ALL_CKPTS) == 15, ALL_CKPTS


@pytest.mark.parametrize("ckpt", ALL_CKPTS)
def test_checkpoint_forward_parity(ckpt):
    import torch

    from rtdm_tpu.data.aider import normalize_batch
    from tests import torch_ref

    sd = load_torch_state_dict(str(CLS_WEIGHTS / ckpt))
    arch = infer_classifier_arch(sd)
    model = create_model(arch)
    variables = classifier_variables_from_torch(sd)

    u8 = _real_batch(model.image_size)
    x = np.asarray(normalize_batch(jnp.asarray(u8)))

    fwd = {"squeeze-ernet": torch_ref.squeeze_ernet_forward,
           "squeeze-redconv": torch_ref.squeeze_redconv_forward,
           "ernet": torch_ref.ernet_forward}[arch]
    with torch.no_grad():
        want = fwd(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                   sd).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x)))

    max_abs = float(np.max(np.abs(got - want)))
    print(f"{ckpt}: arch={arch} max|Δprob|={max_abs:.2e} "
          f"argmax_agree={np.mean(got.argmax(1) == want.argmax(1)):.0%}")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert np.array_equal(got.argmax(1), want.argmax(1))
