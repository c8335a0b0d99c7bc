"""LR schedules vs the torch schedulers the reference trains with
(code/disaster_detection/train.py:99-127): OneCycleLR (anneal cos),
CosineAnnealingLR, ReduceLROnPlateau."""

import numpy as np
import pytest
import torch

from rtdm_tpu.train.schedules import (PlateauScaler, cosine_schedule,
                                      make_schedule, onecycle_schedule)


def _torch_onecycle(lr, total, pct_start, div=25.0, final_div=1e4):
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    ts = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=lr, total_steps=total, pct_start=pct_start,
        div_factor=div, final_div_factor=final_div, anneal_strategy="cos")
    out = []
    for _ in range(total):
        out.append(opt.param_groups[0]["lr"])
        opt.step()
        ts.step()
    return np.array(out)


@pytest.mark.parametrize("total,pct", [(200, 0.1), (50, 0.3), (1000, 0.05)])
def test_onecycle_matches_torch_step_for_step(total, pct):
    lr = 3e-3
    sched = onecycle_schedule(lr, total, pct_start=pct)
    ours = np.array([float(sched(i)) for i in range(total)])
    want = _torch_onecycle(lr, total, pct)
    # the schedule computes in f32 under jit; the only deviation from
    # torch's f64 curve is cos() rounding at the ~1e-7 tail values
    np.testing.assert_allclose(ours, want, rtol=3e-4, atol=1e-10)
    # the two torch landmarks optax gets wrong: peak step and final floor
    assert ours.argmax() == want.argmax()
    np.testing.assert_allclose(ours[-1], lr / 25.0 / 1e4, rtol=3e-4)


def test_cosine_matches_torch():
    lr, total, eta_min = 1e-2, 120, 1e-6
    sched = cosine_schedule(lr, total, min_lr=eta_min)
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    ts = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=total,
                                                    eta_min=eta_min)
    want = []
    for _ in range(total):
        want.append(opt.param_groups[0]["lr"])
        opt.step()
        ts.step()
    ours = np.array([float(sched(i)) for i in range(total)])
    # optax cosine_decay: lr*( (1-a)*0.5*(1+cos(pi*t/T)) + a ), identical
    # to torch's closed form at every step
    np.testing.assert_allclose(ours, np.array(want), rtol=1e-5, atol=1e-9)


def test_plateau_scaler_matches_torch():
    """PlateauScaler (host-side) vs torch ReduceLROnPlateau on a noisy
    loss trace: the lr scale after every epoch must agree."""
    rng = np.random.default_rng(0)
    base_lr = 0.1
    trace = list(1.0 / np.arange(1, 15)) + [0.08] * 20 + [0.02] + [0.5] * 25
    trace = [t + 1e-4 * rng.standard_normal() for t in trace]

    scaler = PlateauScaler(factor=0.1, patience=5, min_lr=1e-6,
                           base_lr=base_lr)
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    ts = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.1, patience=5, min_lr=1e-6)
    for ep, val in enumerate(trace):
        scale = scaler.update(val)
        ts.step(val)
        want = opt.param_groups[0]["lr"] / base_lr
        np.testing.assert_allclose(scale, want, rtol=1e-9,
                                   err_msg=f"epoch {ep} val {val}")


def test_make_schedule_reduce_is_constant():
    s = make_schedule("reduce", 5e-3, 100)
    assert s == 5e-3
