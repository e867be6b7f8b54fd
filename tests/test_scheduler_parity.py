"""LR schedule parity vs the reference closures (`open_clip_train/scheduler.py`)."""

import numpy as np
import pytest

from refining_clip_via_dinov2_representations_tpu.train.scheduler import (
    const_lr,
    const_lr_cooldown,
    cosine_lr,
)
from tests.ref_loader import load_ref_train, reference_available

if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)


class _FakeOpt:
    def __init__(self):
        self.param_groups = [{"lr": 0.0}]


@pytest.mark.parametrize("warmup,steps", [(10, 100), (0, 50)])
def test_cosine_lr_parity(warmup, steps):
    ref_mod = load_ref_train("scheduler")
    opt = _FakeOpt()
    ref_fn = ref_mod.cosine_lr(opt, 1e-3, warmup, steps, lr_min=1e-5)
    ours = cosine_lr(1e-3, warmup, steps, lr_min=1e-5)
    for step in range(steps):
        want = ref_fn(step)
        got = float(ours(step))
        assert abs(want - got) < 1e-9, (step, want, got)


def test_const_lr_parity():
    ref_mod = load_ref_train("scheduler")
    opt = _FakeOpt()
    ref_fn = ref_mod.const_lr(opt, 5e-4, 5, 40)
    ours = const_lr(5e-4, 5, 40)
    for step in range(40):
        assert abs(ref_fn(step) - float(ours(step))) < 1e-9, step


def test_const_lr_cooldown_parity():
    ref_mod = load_ref_train("scheduler")
    opt = _FakeOpt()
    ref_fn = ref_mod.const_lr_cooldown(opt, 5e-4, 5, 60, 20, cooldown_power=2.0,
                                       cooldown_end_lr=1e-6)
    ours = const_lr_cooldown(5e-4, 5, 60, 20, cooldown_power=2.0,
                             cooldown_end_lr=1e-6)
    for step in range(60):
        assert abs(ref_fn(step) - float(ours(step))) < 1e-9, step


def test_make_schedule_cooldown_epochs_to_steps():
    """epochs_cooldown is in EPOCHS; reference main.py:762-764 converts it to
    steps via steps_per_epoch * epochs_cooldown before calling the schedule."""
    import types

    from refining_clip_via_dinov2_representations_tpu.train.scheduler import (
        make_schedule,
    )

    ref_mod = load_ref_train("scheduler")
    args = types.SimpleNamespace(
        lr_scheduler="const-cooldown", warmup=5, epochs_cooldown=2,
        lr_cooldown_power=1.0, lr_cooldown_end=0.0, epochs=6,
    )
    steps_per_epoch, total = 10, 60
    ours = make_schedule(args, 5e-4, total, steps_per_epoch)
    ref_fn = ref_mod.const_lr_cooldown(
        _FakeOpt(), 5e-4, 5, total, steps_per_epoch * args.epochs_cooldown,
        cooldown_power=1.0, cooldown_end_lr=0.0,
    )
    for step in range(total):
        assert abs(ref_fn(step) - float(ours(step))) < 1e-9, step
    # cooldown must start at step 40 (= 60 - 2 epochs * 10), not at step 58
    assert float(ours(39)) == pytest.approx(5e-4)
    assert float(ours(45)) < 5e-4

    with pytest.raises(AssertionError):
        make_schedule(
            types.SimpleNamespace(lr_scheduler="const-cooldown", warmup=5,
                                  epochs_cooldown=None),
            5e-4, total, steps_per_epoch,
        )
