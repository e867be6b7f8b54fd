"""Shared fixed-signature batch encoding for the offline eval tools.

Every eval CLI encodes a list of image paths through a jitted function; the
trailing batch is zero-padded to the full batch size so the jit signature
never changes (one compile per tool). This helper replaces the previously
copy-pasted pad-encode-slice blocks in `offline.extract_features`,
`clip_blinds_cli`, and `extract_dino_features` — drift between those copies
would silently change compile/retrace behavior per tool.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional, Sequence

import numpy as np


def encode_images_padded(
    encode_fn: Callable,
    paths: Sequence[str],
    preprocess: Callable,
    batch_size: int,
    log_tag: Optional[str] = None,
) -> np.ndarray:
    """PIL-load + preprocess `paths` and push them through `encode_fn` in
    fixed-size zero-padded batches; returns the row-concatenated fp32 array
    (padding rows sliced off)."""
    import jax.numpy as jnp
    from PIL import Image

    out = []
    for i in range(0, len(paths), batch_size):
        chunk = paths[i : i + batch_size]
        imgs = np.stack(
            [preprocess(Image.open(p).convert("RGB")) for p in chunk]
        )
        n = imgs.shape[0]
        if n < batch_size:
            imgs = np.concatenate(
                [imgs, np.zeros((batch_size - n, *imgs.shape[1:]), imgs.dtype)]
            )
        out.append(np.asarray(encode_fn(jnp.asarray(imgs)), np.float32)[:n])
        if log_tag:
            logging.info(
                "[%s] %d / %d", log_tag, min(i + batch_size, len(paths)), len(paths)
            )
    if not out:
        return np.empty((0, 0), np.float32)
    return np.concatenate(out)
