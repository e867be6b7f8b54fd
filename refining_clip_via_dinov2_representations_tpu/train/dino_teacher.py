"""DINO teacher utilities: live feature extraction + soft-label math.

Rebuild of `src/open_clip_train/dino_features_etc.py`. Two consumption modes
(SURVEY §7 hard part 4):

* **precomputed** (parity mode): features come from the mmap store
  (`train/data.DinoFeatureStore`) — the production path of the reference.
* **live teacher** (BASELINE configs 2-5): a frozen JAX DINOv2 runs inside
  the train step on the same batch; `renormalize_clip_to_imagenet` converts
  CLIP-normalized pixels to the teacher's ImageNet normalization without a
  host round-trip.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD
from ..models.dinov2 import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    Dinov2,
    load_dinov2_model,
)


def renormalize_clip_to_imagenet(
    images: jnp.ndarray,
    input_mean: Tuple[float, ...] = OPENAI_DATASET_MEAN,
    input_std: Tuple[float, ...] = OPENAI_DATASET_STD,
) -> jnp.ndarray:
    """Student-normalized NHWC pixels → ImageNet-normalized (teacher input).

    `input_mean`/`input_std` are the student pipeline's normalization
    constants (OpenAI CLIP stats by default; 0.5/0.5 for SigLIP towers)."""
    clip_mean = jnp.asarray(input_mean, images.dtype)
    clip_std = jnp.asarray(input_std, images.dtype)
    in_mean = jnp.asarray(IMAGENET_DEFAULT_MEAN, images.dtype)
    in_std = jnp.asarray(IMAGENET_DEFAULT_STD, images.dtype)
    raw = images * clip_std + clip_mean
    return (raw - in_mean) / in_std


def resize_for_teacher(images: jnp.ndarray, patch_size: int = 14) -> jnp.ndarray:
    """Resize NHWC batch to the nearest patch-multiple square ≤ input
    (224→224 for the standard pipeline; 256→252 etc.)."""
    b, h, w, c = images.shape
    th = (h // patch_size) * patch_size
    tw = (w // patch_size) * patch_size
    if (th, tw) == (h, w):
        return images
    return jax.image.resize(images, (b, th, tw, c), method="cubic")


class LiveDinoTeacher:
    """Frozen DINOv2 running on-device inside the training step."""

    def __init__(
        self,
        model: Dinov2,
        variables,
        from_clip_normalized: bool = True,
        input_mean: Tuple[float, ...] = OPENAI_DATASET_MEAN,
        input_std: Tuple[float, ...] = OPENAI_DATASET_STD,
    ):
        self.model = model
        self.variables = jax.tree.map(jax.lax.stop_gradient, variables)
        self.from_clip_normalized = from_clip_normalized
        self.input_mean = tuple(input_mean)
        self.input_std = tuple(input_std)

    @classmethod
    def from_pretrained(
        cls,
        model_name: str = "facebook/dinov2-small",
        dtype=jnp.float32,
        cache_dir: Optional[str] = None,
        input_mean: Tuple[float, ...] = OPENAI_DATASET_MEAN,
        input_std: Tuple[float, ...] = OPENAI_DATASET_STD,
    ):
        model, variables = load_dinov2_model(model_name, dtype=dtype, cache_dir=cache_dir)
        return cls(model, variables, input_mean=input_mean, input_std=input_std)

    def extract(self, images: jnp.ndarray, variables=None) -> jnp.ndarray:
        """CLS features for a batch (`extract_dino_features`,
        `dino_features_etc.py:17-33`). Input NHWC, CLIP- or [0,1]-normalized.

        Inside a jit, pass the teacher weights via `variables` so they are
        traced ARGUMENTS; falling back to `self.variables` closure-captures
        them, which bakes the full weight tensors into the compiled program
        as HLO literals (a dinov2-large teacher adds ~1.2 GB of constants to
        every executable — fine for tiny test teachers, ruinous at scale)."""
        x = images
        if self.from_clip_normalized:
            x = renormalize_clip_to_imagenet(x, self.input_mean, self.input_std)
        x = resize_for_teacher(x, self.model.cfg.patch_size)
        feats = self.model.apply(
            self.variables if variables is None else variables, x
        )
        return jax.lax.stop_gradient(feats)


def compute_pairwise_similarities(features: jnp.ndarray) -> jnp.ndarray:
    """Pairwise cosine similarities (`dino_features_etc.py:36-42`)."""
    normed = features / jnp.maximum(
        jnp.linalg.norm(features, axis=1, keepdims=True), 1e-12
    )
    return normed @ normed.T


def create_soft_labels(similarities: jnp.ndarray, temperature: float = 0.02) -> jnp.ndarray:
    """(`dino_features_etc.py:45-48`)"""
    return jax.nn.softmax(similarities / temperature, axis=1)


def compute_soft_label_loss(
    predicted_similarities: jnp.ndarray, soft_labels: jnp.ndarray
) -> jnp.ndarray:
    """KL(q || softmax(pred)) batchmean (`dino_features_etc.py:51-56`)."""
    log_p = jax.nn.log_softmax(predicted_similarities.astype(jnp.float32), axis=1)
    q = soft_labels.astype(jnp.float32)
    log_q = jnp.where(q > 0, jnp.log(jnp.maximum(q, 1e-38)), 0.0)
    return jnp.sum(jnp.where(q > 0, q * (log_q - log_p), 0.0)) / q.shape[0]
