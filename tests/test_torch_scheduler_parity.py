"""Hard parity: our LR schedules vs the actual torch schedulers.

The reference drives torch.optim.lr_scheduler objects through Lightning
(`/root/reference/src/opt/optimizer.py`); here we validate our closed-form
`schedule_scale` curves against the real torch implementations epoch by
epoch (torch-cpu is available in the image).
"""

import numpy as np
import pytest
import torch

from vit_tpu.train.optim import OptSpec, PlateauScheduler, schedule_scale

SPE = 10  # steps per epoch


def _torch_lrs_per_epoch(scheduler_fn, epochs, lr=1.0):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr)
    sched = scheduler_fn(opt)
    lrs = []
    for _ in range(epochs):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.array(lrs)


def _ours_per_epoch(spec, epochs):
    f = schedule_scale(spec)
    return np.array([float(f(e * SPE)) for e in range(epochs)]) * spec.lr


def test_cosine_matches_torch():
    # epochs > 2*T_max: torch CosineAnnealingLR is PERIODIC past T_max (the
    # recursive form equals the unclamped closed form, verified to 1e-15);
    # the full range including the post-T_max upswing must match.
    epochs, t_max, eta_min = 25, 10, 1e-3
    torch_lrs = _torch_lrs_per_epoch(
        lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(o, T_max=t_max, eta_min=eta_min),
        epochs,
    )
    spec = OptSpec(lr=1.0, scheduler="cosine", t_max=t_max, eta_min=eta_min,
                   steps_per_epoch=SPE, total_epochs=epochs)
    ours = _ours_per_epoch(spec, epochs)
    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-5, atol=1e-7)


def test_constant_matches_torch():
    epochs = 8
    torch_lrs = _torch_lrs_per_epoch(
        lambda o: torch.optim.lr_scheduler.ConstantLR(o, factor=0.5, total_iters=3),
        epochs,
    )
    spec = OptSpec(lr=1.0, scheduler="constant", constant_factor=0.5,
                   constant_total_iters=3, steps_per_epoch=SPE, total_epochs=epochs)
    np.testing.assert_allclose(_ours_per_epoch(spec, epochs), torch_lrs, rtol=1e-6)


def test_warmup_sequential_matches_torch():
    """LinearLR(0.1, warm) -> CosineAnnealingLR via SequentialLR."""
    epochs, warm, t_max = 14, 4, 10
    def make(o):
        w = torch.optim.lr_scheduler.LinearLR(o, start_factor=0.1, total_iters=warm)
        c = torch.optim.lr_scheduler.CosineAnnealingLR(o, T_max=t_max)
        return torch.optim.lr_scheduler.SequentialLR(o, [w, c], milestones=[warm])
    torch_lrs = _torch_lrs_per_epoch(make, epochs)
    spec = OptSpec(lr=1.0, scheduler="cosine", t_max=t_max, warmup_epochs=warm,
                   steps_per_epoch=SPE, total_epochs=epochs)
    np.testing.assert_allclose(_ours_per_epoch(spec, epochs), torch_lrs, rtol=1e-5)


def test_onecycle_matches_torch():
    epochs = 10
    total_steps = epochs * SPE
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=1.0, total_steps=total_steps, pct_start=0.3,
        div_factor=25.0, final_div_factor=1e4, anneal_strategy="cos",
    )
    torch_lrs = []
    for _ in range(total_steps):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    spec = OptSpec(lr=1.0, scheduler="onecycle", pct_start=0.3, div_factor=25.0,
                   final_div_factor=1e4, steps_per_epoch=SPE, total_epochs=epochs)
    f = schedule_scale(spec)
    ours = np.array([float(f(s)) for s in range(total_steps)])
    np.testing.assert_allclose(ours, np.array(torch_lrs), atol=1e-5)


def test_plateau_matches_torch():
    values = [1.0, 1.0, 1.0, 1.0, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5]
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=2
    )
    torch_lrs = []
    for v in values:
        sched.step(v)
        torch_lrs.append(opt.param_groups[0]["lr"])
    ours = PlateauScheduler(factor=0.5, patience=2, mode="min")
    our_lrs = [ours.step(v) for v in values]
    np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-6)
