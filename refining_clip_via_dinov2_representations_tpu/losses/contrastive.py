"""Contrastive objectives as pure JAX functions.

TPU-native redesign of the reference loss zoo (`src/open_clip/loss.py`):
torch.distributed collectives become named-axis XLA collectives that ride the
ICI mesh. A loss here is a pure function of features — usable single-device
(``axis_name=None``), under ``shard_map`` with explicit collectives, or under
plain GSPMD jit.

Collective mapping (SURVEY §2.6):
  `gather_features` all_gather (`loss.py:23-81`)  → `lax.all_gather(tiled=True)`
      — differentiable by construction, so the reference's `gather_with_grad`
      distinction disappears (JAX's all_gather transposes to psum_scatter).
  `local_loss` row-block labels (`loss.py:107-118`) → `lax.axis_index` offset.
  SigLIP neighbour P2P ring (`loss.py:952-1050`)  → `lax.ppermute` ring shifts.

Cross entropy is computed in float32 regardless of feature dtype.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _log_softmax_fp32(logits: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over rows with integer labels (F.cross_entropy parity)."""
    logp = _log_softmax_fp32(logits)
    picked = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return -jnp.mean(picked)


def gather_features(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    axis_name: Optional[str],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-gather features over the data axis (`loss.py:23-81`).

    `lax.all_gather(..., tiled=True)` concatenates the per-device row blocks
    in axis order — identical layout to `torch.cat(dist.all_gather(...))` —
    and carries gradients (psum_scatter in the transpose), giving
    `gather_with_grad=True` semantics for free.
    """
    if axis_name is None:
        return image_features, text_features
    all_image = lax.all_gather(image_features, axis_name, tiled=True)
    all_text = lax.all_gather(text_features, axis_name, tiled=True)
    return all_image, all_text


def clip_logits(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    axis_name: Optional[str] = None,
    local_loss: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build contrastive logits + ground-truth labels (`loss.py:107-144`).

    Returns (logits_per_image, logits_per_text, labels). In `local_loss` mode
    logits are `[B_local, B_global]` with labels offset by
    `axis_index * B_local`; otherwise the full `[B_global, B_global]` matrix
    is formed on every device (memory-hungry — parity mode only).
    """
    b_local = image_features.shape[0]
    if axis_name is None:
        logits_per_image = logit_scale * image_features @ text_features.T
        logits_per_text = logit_scale * text_features @ image_features.T
        labels = jnp.arange(b_local, dtype=jnp.int32)
        return logits_per_image, logits_per_text, labels

    all_image, all_text = gather_features(image_features, text_features, axis_name)
    if local_loss:
        logits_per_image = logit_scale * image_features @ all_text.T
        logits_per_text = logit_scale * text_features @ all_image.T
        labels = jnp.arange(b_local, dtype=jnp.int32) + b_local * lax.axis_index(axis_name)
    else:
        logits_per_image = logit_scale * all_image @ all_text.T
        logits_per_text = logits_per_image.T
        labels = jnp.arange(all_image.shape[0], dtype=jnp.int32)
    return logits_per_image, logits_per_text, labels


def clip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    axis_name: Optional[str] = None,
    local_loss: bool = True,
) -> jnp.ndarray:
    """Symmetric InfoNCE (`ClipLoss`, `loss.py:84-159`).

    Under a data axis each device returns the mean CE over its local rows;
    averaging across devices happens through gradient psum (pjit) — identical
    to DDP loss-mean semantics when all local batches are equal-sized.
    """
    logits_i, logits_t, labels = clip_logits(
        image_features, text_features, logit_scale, axis_name, local_loss
    )
    return 0.5 * (cross_entropy(logits_i, labels) + cross_entropy(logits_t, labels))


# ---------------------------------------------------------------------------
# SigLIP
# ---------------------------------------------------------------------------

def _siglip_pair_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: Optional[jnp.ndarray],
    negative_only: bool = False,
) -> jnp.ndarray:
    """Pairwise sigmoid loss for one (image-block, text-block) pair
    (`SigLipLoss._loss`, `loss.py:655-671`)."""
    logits = logit_scale * image_features @ text_features.T
    if logit_bias is not None:
        logits = logits + logit_bias
    b = image_features.shape[0]
    labels = -jnp.ones((b, b), dtype=logits.dtype)
    if not negative_only:
        labels = labels + 2.0 * jnp.eye(b, dtype=logits.dtype)
    return -jnp.sum(jax.nn.log_sigmoid(labels * logits.astype(jnp.float32))) / b


def siglip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
    axis_name: Optional[str] = None,
    axis_size: int = 1,
    dist_impl: str = "shift",
) -> jnp.ndarray:
    """SigLIP loss with ring-shifted negatives (`SigLipLoss`, `loss.py:610-756`).

    dist_impl:
      "shift"  — unidirectional `ppermute` ring: W-1 hops, each bringing the
                 next device's text block (reference `loss.py:712-729`).
      "bidir"  — two counter-rotating rings, halving hop count
                 (reference `loss.py:679-711`); maps to both ICI directions.
      "gather" — one all_gather then mask out the local block.
      "reduce" — W masked-psum broadcast rounds (reference `loss.py:730-742`).

    `axis_size` must be the static mesh-axis size (python int) because the
    hop loop is unrolled at trace time.
    """
    loss = _siglip_pair_loss(image_features, text_features, logit_scale, logit_bias)
    if axis_name is None or axis_size <= 1:
        return loss

    n = axis_size
    if dist_impl == "shift":
        right = [(i, (i + 1) % n) for i in range(n)]
        block = text_features
        for _ in range(n - 1):
            block = lax.ppermute(block, axis_name, perm=right)
            loss = loss + _siglip_pair_loss(
                image_features, block, logit_scale, logit_bias, negative_only=True
            )
    elif dist_impl == "bidir":
        right = [(i, (i + 1) % n) for i in range(n)]
        left = [(i, (i - 1) % n) for i in range(n)]
        to_left = to_right = text_features
        num_bidir, remainder = divmod(n - 1, 2)
        for _ in range(num_bidir):
            from_right = lax.ppermute(to_left, axis_name, perm=left)
            from_left = lax.ppermute(to_right, axis_name, perm=right)
            for block in (from_right, from_left):
                loss = loss + _siglip_pair_loss(
                    image_features, block, logit_scale, logit_bias, negative_only=True
                )
            to_left, to_right = from_right, from_left
        if remainder:
            block = lax.ppermute(to_right, axis_name, perm=right)
            loss = loss + _siglip_pair_loss(
                image_features, block, logit_scale, logit_bias, negative_only=True
            )
    elif dist_impl == "gather":
        # One [b, n*b] matmul against the full gathered text block with the
        # local diagonal block masked out elementwise — same sum as the
        # reference's per-block loop (`loss.py:742-751`, which computes the
        # own-rank block and zero-weights it), but as a single large MXU
        # matmul with no wasted block. SPMD can't skip the local block
        # statically (axis_index is traced), so masking is the fast form.
        all_text = lax.all_gather(text_features, axis_name)  # [n, b, d]
        my = lax.axis_index(axis_name)
        b = image_features.shape[0]
        flat = all_text.reshape(n * b, -1)
        logits = logit_scale * image_features @ flat.T  # [b, n*b]
        if logit_bias is not None:
            logits = logits + logit_bias
        # all gathered pairs are negatives (positives were scored above)
        per_pair = -jax.nn.log_sigmoid(-logits.astype(jnp.float32))
        col_mask = (jnp.arange(n * b) // b != my).astype(jnp.float32)
        loss = loss + jnp.sum(per_pair * col_mask) / b
    elif dist_impl == "reduce":
        # masked all_reduce broadcast (reference `loss.py:730-742`): W rounds,
        # round i psums `text * (rank == i)` so every device receives rank i's
        # block, then scores it as negatives (skipped on rank i itself).
        my = lax.axis_index(axis_name)
        for i in range(n):
            mask = (my == i).astype(text_features.dtype)
            block = lax.psum(text_features * mask, axis_name)
            neg = _siglip_pair_loss(
                image_features, block, logit_scale, logit_bias, negative_only=True
            )
            loss = loss + jnp.where(my == i, 0.0, 1.0) * neg
    else:
        raise ValueError(f"unknown dist_impl {dist_impl!r}")
    return loss


# ---------------------------------------------------------------------------
# CoCa / CyCLIP / Distill
# ---------------------------------------------------------------------------

def coca_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    caption_logits: jnp.ndarray,
    caption_labels: jnp.ndarray,
    logit_scale: jnp.ndarray,
    caption_loss_weight: float = 2.0,
    clip_loss_weight: float = 1.0,
    pad_id: int = 0,
    axis_name: Optional[str] = None,
    local_loss: bool = True,
):
    """CLIP CE + caption CE ignoring pad tokens (`CoCaLoss`, `loss.py:761-811`)."""
    contrastive = jnp.zeros((), jnp.float32)
    if clip_loss_weight:
        contrastive = clip_loss_weight * clip_loss(
            image_features, text_features, logit_scale, axis_name, local_loss
        )
    logp = _log_softmax_fp32(caption_logits)  # [B, L, V]
    picked = jnp.take_along_axis(logp, caption_labels[..., None], axis=-1)[..., 0]
    valid = (caption_labels != pad_id).astype(jnp.float32)
    caption = -jnp.sum(picked * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return {
        "contrastive_loss": contrastive,
        "caption_loss": caption_loss_weight * caption,
    }


def cyclip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    lambda_inmodal: float = 0.25,
    lambda_crossmodal: float = 0.25,
    axis_name: Optional[str] = None,
    local_loss: bool = True,
):
    """CLIP CE + cyclic consistency penalties (`CyCLIPLoss`, `loss.py:814-905`).

    With `local_loss=True` the consistency terms cover only LOCAL pairs —
    reference-exact: `CyCLIPLoss._get_global_features` (`loss.py:843-848`)
    keeps features local under world_size>1 + local_loss, so per-rank
    consistency coverage shrinking with world size is the reference's own
    (documented) semantics, not a deviation.
    """
    base = clip_loss(image_features, text_features, logit_scale, axis_name, local_loss)

    if axis_name is not None and not local_loss:
        img, txt = gather_features(image_features, text_features, axis_name)
    else:
        img, txt = image_features, text_features
    def _norm(x):
        x = x.astype(jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    i, t = _norm(img), _norm(txt)
    s_ii, s_tt, s_it = i @ i.T, t @ t.T, i @ t.T
    l_cross = jnp.mean(jnp.square(s_it - s_it.T))
    l_inmod = jnp.mean(jnp.square(s_ii - s_tt))
    total = base + lambda_inmodal * l_inmod + lambda_crossmodal * l_cross
    return {
        "total_loss": total,
        "clip_loss": base,
        "inmodal_cyclic": l_inmod,
        "crossmodal_cyclic": l_cross,
    }


def distill_clip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    dist_image_features: jnp.ndarray,
    dist_text_features: jnp.ndarray,
    dist_logit_scale: jnp.ndarray,
    axis_name: Optional[str] = None,
    local_loss: bool = True,
):
    """CLIP CE + soft CE against a CLIP teacher (`DistillClipLoss`,
    `loss.py:907-949`)."""
    logits_i, logits_t, labels = clip_logits(
        image_features, text_features, logit_scale, axis_name, local_loss
    )
    t_logits_i, t_logits_t, _ = clip_logits(
        dist_image_features, dist_text_features, dist_logit_scale, axis_name, local_loss
    )

    contrastive = 0.5 * (cross_entropy(logits_i, labels) + cross_entropy(logits_t, labels))

    def soft_ce(teacher_logits, student_logits):
        q = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=1)
        return -jnp.mean(jnp.sum(q * _log_softmax_fp32(student_logits), axis=1))

    distill = 0.5 * (soft_ce(t_logits_i, logits_i) + soft_ce(t_logits_t, logits_t))
    return {"contrastive_loss": contrastive, "distill_loss": distill}
