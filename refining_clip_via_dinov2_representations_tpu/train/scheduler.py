"""Learning-rate schedules.

Reference (`src/open_clip_train/scheduler.py`) mutates `optimizer.lr` from a
host-side closure each step; here schedules are pure `step -> lr` functions
that run *in-graph* inside the optax update (jnp ops, no host round-trip, no
recompile per step).

QUIRK DECISION (SURVEY §7 hard part 2): the reference scheduler assigns ONE
lr to every param group, silently flattening the per-group LRs set up in
`main.py:538-656`. We implement the *fixed* behaviour — each group's lr is
`group_base_lr * (schedule(step) / schedule_base_lr)` — and expose
`flatten_group_lrs=True` on the optimizer builder for bug-compatible runs.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _warmup(base_lr: float, warmup_length: int, step):
    return base_lr * (step + 1.0) / max(1, warmup_length)


def const_lr(base_lr: float, warmup_length: int, steps: int) -> Schedule:
    """(`scheduler.py:13-22`)"""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(
            step < warmup_length, _warmup(base_lr, warmup_length, step), base_lr
        )

    return sched


def const_lr_cooldown(
    base_lr: float,
    warmup_length: int,
    steps: int,
    cooldown_steps: int,
    cooldown_power: float = 1.0,
    cooldown_end_lr: float = 0.0,
) -> Schedule:
    """Constant then polynomial cooldown (`scheduler.py:25-42`)."""
    start_cooldown = steps - cooldown_steps

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        e = step - start_cooldown
        es = max(1, steps - start_cooldown)
        decay = jnp.power(jnp.clip(1.0 - e / es, 0.0, 1.0), cooldown_power)
        cooled = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        main = jnp.where(step < start_cooldown, base_lr, cooled)
        return jnp.where(step < warmup_length, _warmup(base_lr, warmup_length, step), main)

    return sched


def cosine_lr(
    base_lr: float, warmup_length: int, steps: int, lr_min: float = 0.0
) -> Schedule:
    """Cosine decay with warmup and lr_min floor (`scheduler.py:45-63`)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        e = step - warmup_length
        es = max(1, steps - warmup_length)
        cosine_decay = 0.5 * (1.0 + jnp.cos(math.pi * jnp.clip(e / es, 0.0, 1.0)))
        lr = lr_min + (base_lr - lr_min) * cosine_decay
        return jnp.where(step < warmup_length, _warmup(base_lr, warmup_length, step), lr)

    return sched


def make_schedule(
    args_like, base_lr: float, total_steps: int, steps_per_epoch: int | None = None
) -> Schedule:
    """Dispatch mirroring `main.py:749-778`."""
    name = getattr(args_like, "lr_scheduler", "cosine")
    warmup = getattr(args_like, "warmup", 10000)
    if name == "cosine":
        return cosine_lr(base_lr, warmup, total_steps, getattr(args_like, "lr_min", 0.0))
    if name == "const":
        return const_lr(base_lr, warmup, total_steps)
    if name == "const-cooldown":
        # reference main.py:759-764: epochs_cooldown is in EPOCHS and is
        # converted to steps via (num_batches // accum_freq) * epochs_cooldown
        epochs_cooldown = getattr(args_like, "epochs_cooldown", None)
        assert epochs_cooldown is not None, (
            "Please specify the number of cooldown epochs for this lr schedule."
        )
        if steps_per_epoch is None:
            epochs = max(1, getattr(args_like, "epochs", 1))
            steps_per_epoch = total_steps // epochs
        cooldown_steps = steps_per_epoch * epochs_cooldown
        return const_lr_cooldown(
            base_lr,
            warmup,
            total_steps,
            cooldown_steps,
            getattr(args_like, "lr_cooldown_power", 1.0),
            getattr(args_like, "lr_cooldown_end", 0.0),
        )
    raise ValueError(f"Unknown scheduler {name!r}; options: cosine, const, const-cooldown")
