"""Precision policy helpers (`src/open_clip_train/precision.py`).

On TPU there is no autocast/GradScaler: mixed precision is bf16 compute over
fp32 params, chosen at model construction. These helpers keep the reference
API shape so harness code ports cleanly.
"""

from __future__ import annotations

import contextlib

import jax.numpy as jnp


def get_cast_dtype(precision: str):
    """Weight/compute dtype for a precision flag (reference `model.py:148-155`)."""
    if precision in ("bf16", "pure_bf16", "amp_bf16", "amp_bfloat16"):
        return jnp.bfloat16
    if precision in ("fp16", "pure_fp16"):
        return jnp.bfloat16  # fp16 has no TPU advantage; mapped to bf16
    return None


def get_input_dtype(precision: str):
    """Input-pixel dtype for a precision flag (reference `model.py:157-163`)."""
    if precision in ("bf16", "pure_bf16", "amp_bf16", "amp_bfloat16"):
        return jnp.bfloat16
    if precision in ("fp16", "pure_fp16"):
        return jnp.bfloat16
    return jnp.float32


def get_autocast(precision: str, device_type: str = "tpu"):
    """API-parity shim for the reference's autocast factory
    (`precision.py:6-13`). JAX has no autocast context — the compute dtype is
    fixed in the module tree — so this returns a null context; provided so
    ported harness code keeps running."""
    return contextlib.nullcontext
