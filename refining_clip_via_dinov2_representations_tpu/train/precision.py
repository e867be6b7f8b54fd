"""Precision policy helpers (`src/open_clip_train/precision.py`).

On TPU there is no autocast/GradScaler: mixed precision is bf16 compute over
fp32 params, chosen at model construction. These helpers keep the reference
API shape so harness code ports cleanly.
"""

from __future__ import annotations

import contextlib

# canonical impls live in the library layer (the reference defines them in
# `open_clip/model.py:148-163` and the train harness imports them; same here)
from ..models.api_utils import get_cast_dtype, get_input_dtype  # noqa: F401


def get_autocast(precision: str, device_type: str = "tpu"):
    """API-parity shim for the reference's autocast factory
    (`precision.py:6-13`). JAX has no autocast context — the compute dtype is
    fixed in the module tree — so this returns a null context; provided so
    ported harness code keeps running."""
    return contextlib.nullcontext
