"""Trainer tests: convergence, padded-eval masking, checkpoint roundtrip,
metric aggregation, multi-device data parallelism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtdm_tpu.core.mesh import create_mesh
from rtdm_tpu.core.precision import FP32_POLICY
from rtdm_tpu.eval.classification import ClassificationMetrics
from rtdm_tpu.models import create_model
from rtdm_tpu.train.losses import make_classification_loss
from rtdm_tpu.train.schedules import make_optimizer, make_schedule
from rtdm_tpu.train.trainer import Trainer, create_train_state


@pytest.fixture(scope="module")
def trainer():
    model = create_model("squeeze-ernet")
    tx = make_optimizer("adamw", make_schedule("onecycle", 3e-3, 100))
    return Trainer(model, tx, make_classification_loss("label_smoothing"),
                   policy=FP32_POLICY, grad_accum_steps=2)


@pytest.fixture(scope="module")
def fitted(trainer):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 140, 140, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, (8,)), jnp.int32)
    state = trainer.init_state(jax.random.key(0), (1, 140, 140, 3))
    losses = []
    for _ in range(12):
        state, m = trainer.train_step(state, x, y, jax.random.key(1))
        losses.append(float(m["loss"]))
    return state, losses, (x, y)


def test_loss_decreases(fitted):
    _, losses, _ = fitted
    assert losses[-1] < losses[0] * 0.8


def test_step_counter_and_grads_finite(fitted):
    state, losses, _ = fitted
    assert int(state.step) == 12
    assert all(np.isfinite(losses))


def test_eval_mask_ignores_padding(trainer, fitted):
    state, _, (x, y) = fitted
    out_full = jax.device_get(
        trainer.eval_step(state, x, y, jnp.asarray(8, jnp.int32)))
    # corrupt the last 4 rows; with valid=4 results must not change
    x_bad = x.at[4:].set(0.0)
    y_bad = y.at[4:].set(0)
    out_mask = jax.device_get(
        trainer.eval_step(state, x_bad, y_bad, jnp.asarray(4, jnp.int32)))
    assert out_mask["count"] == 4
    assert out_mask["confusion"].sum() == 4
    np.testing.assert_array_equal(out_mask["confusion"],
                                  _cm(y[:4], state, trainer, x[:4]))
    assert out_full["confusion"].sum() == 8


def _cm(y, state, trainer, x):
    out = jax.device_get(
        trainer.eval_step(state, jnp.concatenate([x, x]),
                          jnp.concatenate([y, y]),
                          jnp.asarray(4, jnp.int32)))
    return out["confusion"]


def test_classification_metrics_math():
    m = ClassificationMetrics(3, ("a", "b", "c"))
    cm = np.array([[5, 1, 0], [2, 6, 0], [0, 0, 4]])
    m.update(cm, loss_sum=3.6, count=18)
    assert m.total == 18
    np.testing.assert_allclose(m.accuracy, 15 / 18)
    pc = m.per_class()
    np.testing.assert_allclose(pc["recall"], [5 / 6, 6 / 8, 1.0])
    np.testing.assert_allclose(pc["precision"], [5 / 7, 6 / 7, 1.0])
    np.testing.assert_allclose(m.loss, 0.2)
    assert "accuracy" in m.report()


def test_checkpoint_roundtrip(trainer, fitted, tmp_path):
    from rtdm_tpu.train.checkpoint import CheckpointManager
    state, _, (x, y) = fitted
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save("last", state, {"epoch": 3, "history": {"val_loss": [1.0, 0.5]}})
    template = trainer.init_state(jax.random.key(9), (1, 140, 140, 3))
    restored, meta = mgr.restore("last", template)
    assert meta["epoch"] == 3
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state is usable
    out = trainer.eval_step(restored, x, y, jnp.asarray(8, jnp.int32))
    assert int(out["count"]) == 8


def test_data_parallel_matches_single_device():
    """Same batch, same seed: 8-device GSPMD step == single-device step."""
    model = create_model("squeeze-ernet")
    loss = make_classification_loss("crossentropy")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 140, 140, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, (8,)), jnp.int32)

    def run(mesh):
        tx = make_optimizer("sgd", 0.01, grad_clip=None)
        tr = Trainer(model, tx, loss, policy=FP32_POLICY, mesh=mesh)
        state = tr.init_state(jax.random.key(0), (1, 140, 140, 3))
        # ONE step: chaining steps lets BN amplify reduction-order float
        # noise chaotically; a single update isolates the collective math
        state, m = tr.train_step(state, x, y, jax.random.key(1))
        return float(m["loss"]), jax.device_get(state.params)

    mesh8 = create_mesh((8,), ("data",))
    loss8, p8 = run(mesh8)
    loss1, p1 = run(None)
    np.testing.assert_allclose(loss8, loss1, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p8),
                    jax.tree_util.tree_leaves(p1)):
        # GSPMD tree-reduces the 8 per-device partial gradients in a
        # different order than the single-device sum; BN's rsqrt amplifies
        # the O(1e-7) float noise over steps. Semantic (not bitwise)
        # equivalence is the contract.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_mixup_cutmix_training_step(rng):
    """Mixing enabled: step runs, loss finite, and with alpha->0.0001 the
    mixed loss approaches the unmixed one (lam ~ 0 or 1)."""
    from rtdm_tpu.train.batch_augment import cutmix_batch, mixup_batch

    model = create_model("squeeze-ernet", dropout_rate=0.0)
    tx = make_optimizer("sgd", 0.01, grad_clip=None)
    loss = make_classification_loss("crossentropy")
    tr = Trainer(model, tx, loss, policy=FP32_POLICY,
                 mixup_alpha=0.2, cutmix_alpha=0.1)
    state = tr.init_state(jax.random.key(0), (1, 140, 140, 3))
    x = jnp.asarray(rng.normal(size=(8, 140, 140, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, (8,)), jnp.int32)
    state, m = tr.train_step(state, x, y, jax.random.key(3))
    assert np.isfinite(float(m["loss"]))

    # unit behavior of the mixers
    img = jnp.asarray(rng.normal(size=(4, 8, 8, 3)), jnp.float32)
    mixed, perm, lam = mixup_batch(jax.random.key(0), img, 0.2)
    assert mixed.shape == img.shape and 0.0 <= float(lam) <= 1.0
    cmix, perm2, lam2 = cutmix_batch(jax.random.key(1), img, 0.1)
    assert cmix.shape == img.shape and 0.0 <= float(lam2) <= 1.0
    # cutmix pixels come from either source batch
    src = np.isin(np.asarray(cmix), np.asarray(img)).mean()
    assert src > 0.99


def test_bf16_training_step(rng):
    """bf16 policy must train (regression: preferred_element_type=f32 in
    convs broke the transpose rule under grad with bf16 kernels)."""
    from rtdm_tpu.core.precision import BF16_POLICY

    model = create_model("squeeze-ernet")
    tx = make_optimizer("adamw", 1e-3)
    tr = Trainer(model, tx, make_classification_loss("label_smoothing"),
                 policy=BF16_POLICY, mixup_alpha=0.2, cutmix_alpha=0.1)
    state = tr.init_state(jax.random.key(0), (1, 140, 140, 3))
    x = jnp.asarray(rng.normal(size=(4, 140, 140, 3)), jnp.float32)
    y = jnp.asarray([0, 1, 2, 3], jnp.int32)
    state, m = tr.train_step(state, x, y, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    assert state.params["conv1"]["kernel"].dtype == jnp.float32  # fp32 master
