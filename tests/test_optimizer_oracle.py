"""Optimizer trajectories vs the torch optimizers the reference uses
(code/disaster_detection/train.py:75-97 adam/adamw/sgd; yolov3/train.py:
85-105 and yolov5/train.py:114-131 SGD(momentum, nesterov) with the
3-param-group weight-decay split).

Same initial params, same gradient sequence, 12 steps — the two
implementations must land on the same parameters. This pins the subtle
semantics: torch Adam's weight_decay is classic L2 added to the gradient
(not decoupled), AdamW is decoupled, SGD nesterov uses
d = g + mu * (mu*buf + g)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp
import optax

from rtdm_tpu.train.schedules import make_optimizer


def _run_optax(tx, w0, grads):
    w = jnp.asarray(w0)
    state = tx.init(w)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, w)
        w = optax.apply_updates(w, updates)
    return np.asarray(w)


def _run_torch(make_opt, w0, grads):
    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = make_opt([p])
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    return p.detach().numpy()


@pytest.fixture()
def traj():
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=6).astype(np.float32)
    grads = [rng.normal(size=6).astype(np.float32) * 0.5 for _ in range(12)]
    return w0, grads


def test_adam_l2_matches_torch(traj):
    """torch.optim.Adam(weight_decay=wd) == add_decayed_weights + adam."""
    w0, grads = traj
    lr, wd = 1e-2, 0.05
    tx = make_optimizer("adam", lr, weight_decay=wd, grad_clip=None,
                        decay_kernels_only=False)
    got = _run_optax(tx, w0, grads)
    want = _run_torch(lambda ps: torch.optim.Adam(ps, lr=lr,
                                                  weight_decay=wd),
                      w0, grads)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_adamw_matches_torch(traj):
    w0, grads = traj
    lr, wd = 1e-2, 0.05
    tx = make_optimizer("adamw", lr, weight_decay=wd, grad_clip=None,
                        decay_kernels_only=False)
    got = _run_optax(tx, w0, grads)
    want = _run_torch(lambda ps: torch.optim.AdamW(ps, lr=lr,
                                                   weight_decay=wd),
                      w0, grads)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_sgd_nesterov_l2_matches_torch(traj):
    w0, grads = traj
    lr, wd, mu = 1e-2, 5e-4, 0.937  # the v5 hyp momentum
    tx = make_optimizer("sgd", lr, weight_decay=wd, momentum=mu,
                        grad_clip=None, decay_kernels_only=False)
    got = _run_optax(tx, w0, grads)
    want = _run_torch(
        lambda ps: torch.optim.SGD(ps, lr=lr, momentum=mu, nesterov=True,
                                   weight_decay=wd), w0, grads)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_grad_clip_matches_torch(traj):
    """clip_by_global_norm before the update == torch clip_grad_norm_."""
    w0, grads = traj
    lr, clip = 1e-2, 0.4
    tx = make_optimizer("sgd", lr, weight_decay=0.0, momentum=0.9,
                        grad_clip=clip, decay_kernels_only=False)
    got = _run_optax(tx, w0, grads)

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([p], lr=lr, momentum=0.9, nesterov=True)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([p], clip)
        opt.step()
    np.testing.assert_allclose(got, p.detach().numpy(), rtol=1e-5,
                               atol=1e-7)


def test_kernel_only_mask_splits_param_groups():
    """The decay mask reproduces the reference's pg0/pg1/pg2 split:
    kernels decayed, biases and BN affine not (yolov5/train.py:114-131)."""
    from rtdm_tpu.train.schedules import kernel_only_mask

    params = {"l0_conv": {"kernel": np.ones((3, 3, 3, 8)),
                          "bias": np.ones(8)},
              "l0_bn": {"scale": np.ones(8), "bias": np.ones(8)},
              "head": {"dense": {"kernel": np.ones((8, 5)),
                                 "bias": np.ones(5)}}}
    mask = kernel_only_mask(params)
    assert mask["l0_conv"]["kernel"] is True
    assert mask["l0_conv"]["bias"] is False
    assert mask["l0_bn"]["scale"] is False
    assert mask["l0_bn"]["bias"] is False
    assert mask["head"]["dense"]["kernel"] is True
    assert mask["head"]["dense"]["bias"] is False
