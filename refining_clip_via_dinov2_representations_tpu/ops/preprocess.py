"""Device-side (XLA-fused) image preprocessing.

The TPU-native fast path: the host ships raw uint8 HWC batches (decoded
JPEG), and resize/crop/normalize run on-device fused into the train step —
replacing the reference's per-worker torchvision CPU pipeline
(`src/open_clip/transform.py`) for throughput-critical training. Exact-PIL
parity lives in the host pipeline (`transform.py`); this path trades
bit-exactness (jax.image bicubic vs PIL's antialiased filter) for fusion.

All functions are jit-compatible with static output sizes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD


def normalize_images(
    x: jnp.ndarray,
    mean: Tuple[float, ...] = OPENAI_DATASET_MEAN,
    std: Tuple[float, ...] = OPENAI_DATASET_STD,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """uint8/float HWC images → normalized float. Scales /255 for int input."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(dtype) / 255.0
    else:
        x = x.astype(dtype)
    mean_a = jnp.asarray(mean, dtype)
    std_a = jnp.asarray(std, dtype)
    return (x - mean_a) / std_a


@functools.partial(jax.jit, static_argnames=("out_size", "method"))
def batched_resize(
    images: jnp.ndarray, out_size: Tuple[int, int], method: str = "cubic"
) -> jnp.ndarray:
    """Resize a [B,H,W,C] batch to [B,th,tw,C] (squash mode)."""
    b, _, _, c = images.shape
    return jax.image.resize(
        images.astype(jnp.float32),
        (b, out_size[0], out_size[1], c),
        method=method,
    )


def center_crop_resize(
    images: jnp.ndarray, out_size: Tuple[int, int], method: str = "cubic"
) -> jnp.ndarray:
    """Shortest-edge resize + center crop for a fixed-size input batch.

    Because shapes under jit are static, the scale factor is computed from the
    (static) input shape: resize so the shorter edge hits the target, then
    center-crop. Matches eval-mode geometry of the host pipeline.
    """
    b, h, w, c = images.shape
    th, tw = out_size
    scale = max(th / h, tw / w)
    rh, rw = int(round(h * scale)), int(round(w * scale))
    resized = jax.image.resize(images.astype(jnp.float32), (b, rh, rw, c), method=method)
    top = (rh - th) // 2
    left = (rw - tw) // 2
    return jax.lax.dynamic_slice(resized, (0, top, left, 0), (b, th, tw, c))


@functools.partial(jax.jit, static_argnames=("out_size", "scale", "ratio", "method"))
def batched_random_resized_crop(
    rng: jax.Array,
    images: jnp.ndarray,
    out_size: Tuple[int, int],
    scale: Tuple[float, float] = (0.9, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    method: str = "cubic",
) -> jnp.ndarray:
    """Per-example RandomResizedCrop on device.

    Train-time analogue of torchvision's RandomResizedCrop
    (`transform.py:334-341`) built on `jax.image.scale_and_translate` so the
    whole batch is one fused XLA op. Crop boxes are sampled per example
    (area-scale uniform, log-uniform aspect, uniform position); out-of-bounds
    aspect draws are clamped instead of rejection-sampled (rejection loops
    don't fit the static-shape compile model; the clamp changes the aspect
    distribution negligibly for the default (3/4, 4/3) bounds).
    """
    b, h, w, c = images.shape
    th, tw = out_size
    k_area, k_ratio, k_pos = jax.random.split(rng, 3)

    area = jax.random.uniform(k_area, (b,), minval=scale[0], maxval=scale[1]) * (h * w)
    log_r = jax.random.uniform(
        k_ratio, (b,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * aspect), 1.0, w)
    ch = jnp.clip(jnp.sqrt(area / aspect), 1.0, h)
    pos = jax.random.uniform(k_pos, (b, 2))
    top = pos[:, 0] * (h - ch)
    left = pos[:, 1] * (w - cw)

    def crop_one(img, ch_i, cw_i, top_i, left_i):
        sy = th / ch_i
        sx = tw / cw_i
        return jax.image.scale_and_translate(
            img.astype(jnp.float32),
            (th, tw, c),
            (0, 1),
            jnp.stack([sy, sx]),
            jnp.stack([-top_i * sy, -left_i * sx]),
            method=method,
        )

    return jax.vmap(crop_one)(images, ch, cw, top, left)


def preprocess_train_batch(
    rng: jax.Array,
    images_u8: jnp.ndarray,
    out_size: Tuple[int, int] = (224, 224),
    mean: Tuple[float, ...] = OPENAI_DATASET_MEAN,
    std: Tuple[float, ...] = OPENAI_DATASET_STD,
    scale: Tuple[float, float] = (0.9, 1.0),
    dtype=jnp.float32,
) -> jnp.ndarray:
    """uint8 [B,H,W,3] → augmented normalized [B,th,tw,3]; fully on device."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = batched_random_resized_crop(rng, x, out_size, scale=scale)
    return normalize_images(x, mean, std).astype(dtype)


def preprocess_eval_batch(
    images_u8: jnp.ndarray,
    out_size: Tuple[int, int] = (224, 224),
    mean: Tuple[float, ...] = OPENAI_DATASET_MEAN,
    std: Tuple[float, ...] = OPENAI_DATASET_STD,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """uint8 [B,H,W,3] → center-cropped normalized [B,th,tw,3] on device."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = center_crop_resize(x, out_size)
    return normalize_images(x, mean, std).astype(dtype)
