"""Pallas blockwise flash attention for TPU (placeholder wiring).

The real kernel lands in the kernel milestone; until then
`flash_attention_compatible` returns False so all callers transparently use
the XLA path. Keeping the module importable lets the dispatch layer stay
stable.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def flash_attention_compatible(q, k, v, mask) -> bool:
    return False


def flash_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    raise NotImplementedError("Pallas flash attention not built yet; use impl='xla'.")
