"""DINO-soft structural-alignment objective — the thesis contribution.

Pure-function rebuild of `ClipLossWithDINOEnhancements`
(`src/open_clip/loss.py:190-607`). Terms:

  (a) classic CLIP CE (`loss.py:313-319`)
  (b) projection head CLIP-dim → DINO-dim (`loss.py:214-238,322-347`).
      **Design fix vs reference**: the reference creates the head lazily on
      first forward, *after* the optimizer is built, so the head is never
      updated (SURVEY §2.2). Here `DinoProjectionHead` is a real flax module
      whose params live in the train state; `freeze_projection` in the train
      config reproduces the reference's accidental behaviour for
      bug-compatible parity runs.
  (c) DINO-soft KL: student image-image similarity softmax (adaptive τ_s from
      logit_scale) vs frozen teacher similarity softmax (τ_t, diag masked to
      -inf) (`loss.py:350-384`)
  (d) optional symmetric text-text KL vs the same teacher q (`loss.py:387-397`)
  (e) denominator-modulated weighted CE: DINO-dissimilarity logit offsets
      Δ = β·r̂ with p-centering (`loss.py:416-471`)
  (f) total = λ_orig·(a) + λ_soft·(c+d) + λ_weighted·(e) (`loss.py:473-477`)
  (g) diagnostics dict (`loss.py:479-595`) — computed in-graph under
      stop_gradient, returned as scalars; enabled by a static flag.

Distributed note: the soft-KL and weighted terms operate on the *local*
per-device batch block (intra-batch structure), exactly as the reference
does; only the classic CLIP term gathers globally. This is the EXECUTED
production semantics: the train step runs this function under `shard_map`
over the data axis (train/step.py make_loss_fn), so `axis_name` is real and
b here is the per-device block — verified end-to-end by
tests/test_step_distributed_semantics.py. The reference's weighted path is
single-process-only (its Δ shapes break for world>1); here the distributed
generalization adds Δ to the local column block.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from .contrastive import clip_logits, cross_entropy


def compute_student_tau(logit_scale: jnp.ndarray) -> jnp.ndarray:
    """Adaptive student temperature (`loss.py:166-175`).

    Accepts either the raw ln-scale (≈2-5) or an already-exponentiated
    multiplicative scale (≈10-100); heuristic threshold 10.
    """
    val = lax.stop_gradient(logit_scale).astype(jnp.float32)
    scale_mult = jnp.where(val > 10.0, val, jnp.exp(val))
    scale_mult = jnp.minimum(scale_mult, 100.0)
    return jnp.clip(1.0 / scale_mult, 0.008, 0.02)


def _normalize(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@dataclasses.dataclass(frozen=True)
class DinoLossCfg:
    """Knob surface of the DINO loss (reference flag names, `params.py`)."""

    lambda_original: float = 1.0      # --lambda_original
    lambda_soft: float = 0.0          # --lambda_soft
    soft_mode: str = "kl_teacher"     # --soft_mode {none,siglip_dino,kl_teacher}
    teacher_temp: float = 0.15        # --teacher_temp
    soft_dino_to_text: bool = False   # --soft_dino_to_text
    text_lambda: float = 0.2          # --text_lambda
    text_student_temp: float = 0.05   # --text_student_temp
    lambda_weighted: float = 0.0      # --lambda_weighted
    rho: float = 0.1                  # --rho
    c_clip: float = 1.0               # --c_clip
    weight_text_symmetry: bool = False  # --weight_text_symmetry
    use_projection: bool = True       # --use_projection
    projection_type: str = "mlp"      # --projection_type {linear,mlp}
    use_layernorm: bool = False       # --use_layernorm
    residual_projection: bool = False # --residual_projection
    residual_alpha: Optional[float] = None  # --residual_alpha
    local_loss: bool = True
    with_diagnostics: bool = False


class DinoProjectionHead(nn.Module):
    """CLIP-embedding → DINO-embedding projection (`loss.py:214-238`).

    linear: one Dense. mlp: Dense(hidden=(d_in+d_out)//2) → ReLU → Dense,
    optionally followed by LayerNorm.
    """

    dino_dim: int
    projection_type: str = "mlp"
    use_layernorm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_in = x.shape[-1]
        if self.projection_type == "linear":
            x = nn.Dense(self.dino_dim, dtype=self.dtype, name="proj")(x)
        elif self.projection_type == "mlp":
            hidden = (d_in + self.dino_dim) // 2
            x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
            x = nn.relu(x)
            x = nn.Dense(self.dino_dim, dtype=self.dtype, name="fc2")(x)
        else:
            raise ValueError(f"Unknown projection_type: {self.projection_type}")
        if self.use_layernorm:
            from ..models.layers import LayerNorm

            x = LayerNorm(name="ln", dtype=self.dtype)(x)
        return x


def apply_projection(
    image_features: jnp.ndarray,
    raw_proj: Optional[jnp.ndarray],
    cfg: DinoLossCfg,
) -> jnp.ndarray:
    """Residual blending + normalize (`loss.py:330-347`)."""
    if raw_proj is None:
        return _normalize(image_features)
    if cfg.residual_projection and raw_proj.shape == image_features.shape:
        if cfg.residual_alpha is None:
            return _normalize(image_features + raw_proj)
        a = cfg.residual_alpha
        return _normalize(a * image_features + (1 - a) * raw_proj)
    return _normalize(raw_proj)


def _soft_kl(
    student_sims: jnp.ndarray, q: jnp.ndarray
) -> jnp.ndarray:
    """KL(q || softmax(student_sims)) batchmean, safe at q == 0 rows/entries."""
    log_p = jax.nn.log_softmax(student_sims.astype(jnp.float32), axis=1)
    log_q = jnp.where(q > 0, jnp.log(jnp.maximum(q, 1e-38)), 0.0)
    terms = jnp.where(q > 0, q * (log_q - log_p), 0.0)
    return jnp.sum(terms) / student_sims.shape[0]


def dino_enhanced_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    dino_features: Optional[jnp.ndarray],
    cfg: DinoLossCfg,
    image_proj: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
    lambda_overrides: Optional[Dict[str, jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    """Full DINO-enhanced objective (`loss.py:292-607`).

    Args:
      image_features / text_features: L2-normalized CLIP outputs, local batch.
      dino_features: frozen teacher features for the same local batch (not
        necessarily normalized), or None → pure CLIP CE.
      image_proj: output of `DinoProjectionHead` applied to image_features
        (raw, pre-normalize); None when `use_projection` is off.
      lambda_overrides: optional traced scalars overriding `lambda_soft` /
        `lambda_weighted` / hard-negative warmup multipliers — used by the
        schedule-driven λ warmup (`train.py:120-141`) without recompiling.

    Returns dict with total_loss / classic_loss / soft_loss / weighted_loss
    (+ dbg/* scalars when cfg.with_diagnostics).
    """
    b = image_features.shape[0]
    ov = lambda_overrides or {}
    lambda_soft = ov.get("lambda_soft", cfg.lambda_soft)
    lambda_weighted = ov.get("lambda_weighted", cfg.lambda_weighted)
    lambda_original = ov.get("lambda_original", cfg.lambda_original)

    # ----- classic CLIP CE over the global batch -----
    logits_i, logits_t, labels = clip_logits(
        image_features, text_features, logit_scale, axis_name, cfg.local_loss
    )
    classic = 0.5 * (cross_entropy(logits_i, labels) + cross_entropy(logits_t, labels))

    # ----- projected image features -----
    zs = apply_projection(image_features, image_proj, cfg) if (
        dino_features is not None and cfg.use_projection
    ) else _normalize(image_features)

    out: Dict[str, jnp.ndarray] = {}

    # ----- soft KL vs DINO teacher -----
    # reference gate (`loss.py:356`): lambda_soft > 0 AND kl_teacher AND
    # teacher features present. soft_mode "none"/"siglip_dino" compute no
    # soft term (siglip_dino is parsed-but-unimplemented in the reference
    # too); the static λ gate also keeps the O(B²) KL out of the graph for
    # weighted-only runs.
    soft = jnp.zeros((), jnp.float32)
    if (
        dino_features is not None
        and cfg.soft_mode == "kl_teacher"
        and cfg.lambda_soft > 0.0
    ):
        dn = _normalize(dino_features.astype(jnp.float32))
        tau_s = compute_student_tau(logit_scale)
        tau_t = jnp.asarray(cfg.teacher_temp, jnp.float32)

        s_student = (zs.astype(jnp.float32) @ zs.astype(jnp.float32).T) / tau_s
        s_teacher = (dn @ dn.T) / tau_t
        eye = jnp.eye(b, dtype=bool)
        s_teacher = jnp.where(eye, -jnp.inf, s_teacher)
        q = lax.stop_gradient(jax.nn.softmax(s_teacher, axis=1))

        soft = _soft_kl(s_student, q)

        if cfg.soft_dino_to_text and cfg.text_lambda > 0.0:
            tn = _normalize(text_features.astype(jnp.float32))
            s_tt = (tn @ tn.T) / cfg.text_student_temp
            soft = soft + cfg.text_lambda * _soft_kl(s_tt, q)

    # ----- denominator-modulated weighted CE -----
    weighted = jnp.zeros((), jnp.float32)
    if cfg.lambda_weighted > 0.0 and dino_features is not None and b > 1:
        dn = lax.stop_gradient(_normalize(dino_features.astype(jnp.float32)))
        r = 1.0 - jnp.clip(dn @ dn.T, -1.0, 1.0)
        eye = jnp.eye(b, dtype=bool)
        r = jnp.where(eye, 0.0, r)

        # this rank's (row, col) block inside the possibly-global logits:
        # local_loss keeps local rows (row offset 0, rank column block);
        # global-loss mode carries every rank's rows, so the rank's own
        # samples sit at the SAME offset on both axes
        n_rows, n_cols = logits_i.shape
        if axis_name is not None:
            idx = lax.axis_index(axis_name)
            col0 = b * idx if n_cols != b else 0
            row0 = b * idx if n_rows != b else 0
        else:
            col0 = row0 = 0

        def modulate(logits, r_mat):
            """Add Δ = β·r̂ to this rank's block of `logits` (`loss.py:432-447`)."""
            sliced = n_rows != b or n_cols != b
            block = (
                lax.dynamic_slice(logits, (row0, col0), (b, b)) if sliced else logits
            )
            p_base_full = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
            p_block = (
                lax.dynamic_slice(p_base_full, (row0, col0), (b, b))
                if sliced
                else p_base_full
            )
            r_hat = r_mat - jnp.sum(p_block * r_mat, axis=1, keepdims=True)
            r_hat = jnp.clip(r_hat, -cfg.c_clip, cfg.c_clip)
            row_std = jnp.std(logits.astype(jnp.float32), axis=1, ddof=1)
            # torch.median picks the lower middle element for even counts
            sigma = jnp.maximum(jnp.sort(row_std)[(row_std.shape[0] - 1) // 2], 1e-6)
            beta = lax.stop_gradient(ov.get("rho", cfg.rho) * sigma / cfg.c_clip)
            delta = jnp.where(jnp.eye(b, dtype=bool), 0.0, beta * r_hat)
            if sliced:
                return lax.dynamic_update_slice(
                    logits, block + delta.astype(logits.dtype), (row0, col0)
                ), delta, p_block
            return logits + delta.astype(logits.dtype), delta, p_block

        logits_i_tilde, delta_img, p_img_block = modulate(logits_i, r)
        ce_img_den = cross_entropy(logits_i_tilde, labels)

        if cfg.weight_text_symmetry:
            logits_t_tilde, delta_txt, p_txt_block = modulate(logits_t, r.T)
        else:
            logits_t_tilde, delta_txt, p_txt_block = logits_t, None, None
        ce_txt_den = cross_entropy(logits_t_tilde, labels)
        weighted = 0.5 * (ce_img_den + ce_txt_den)

        if cfg.with_diagnostics:
            dbg = _weighted_diagnostics(
                logits_i, logits_t, logits_i_tilde, logits_t_tilde,
                delta_img, delta_txt, labels, b,
            )
            out.update({f"dbg/{k}": v for k, v in dbg.items()})

    total = lambda_original * classic + lambda_soft * soft + lambda_weighted * weighted
    out.update(
        total_loss=total,
        classic_loss=classic,
        soft_loss=soft,
        weighted_loss=weighted,
    )
    return out


def _weighted_diagnostics(
    logits_i, logits_t, logits_i_tilde, logits_t_tilde, delta_img, delta_txt, labels, b
):
    """Cheap scalar summaries of the weighted-CE modulation (`loss.py:479-595`)."""
    def _sm(x):
        return jax.nn.softmax(lax.stop_gradient(x).astype(jnp.float32), axis=1)

    p_i, p_it = _sm(logits_i), _sm(logits_i_tilde)
    p_t, p_tt = _sm(logits_t), _sm(logits_t_tilde)
    offdiag = ~jnp.eye(b, dtype=bool)

    def rowwise_corr(a, c, eps=1e-9):
        a = a - jnp.mean(a, axis=1, keepdims=True)
        c = c - jnp.mean(c, axis=1, keepdims=True)
        num = jnp.sum(a * c, axis=1)
        den = jnp.sqrt(jnp.sum(a * a, axis=1)) * jnp.sqrt(jnp.sum(c * c, axis=1)) + eps
        return jnp.mean(num / den)

    dbg = {
        "delta_img_max": jnp.max(jnp.abs(delta_img)),
        "delta_img_mean": jnp.mean(jnp.abs(delta_img)),
        "l1_prob_shift_img": jnp.mean(jnp.sum(jnp.abs(p_it - p_i), axis=1)),
        "l1_prob_shift_txt": jnp.mean(jnp.sum(jnp.abs(p_tt - p_t), axis=1)),
        "ce_img_base": cross_entropy(lax.stop_gradient(logits_i), labels),
        "ce_img_mod": cross_entropy(lax.stop_gradient(logits_i_tilde), labels),
        "ce_txt_base": cross_entropy(lax.stop_gradient(logits_t), labels),
        "ce_txt_mod": cross_entropy(lax.stop_gradient(logits_t_tilde), labels),
        "pos_frac_img": jnp.mean((jnp.where(offdiag, delta_img, 0.0) > 0).astype(jnp.float32)),
    }
    if delta_txt is not None:
        dbg.update(
            delta_txt_max=jnp.max(jnp.abs(delta_txt)),
            delta_txt_mean=jnp.mean(jnp.abs(delta_txt)),
        )
    # corr(r̂∝Δ, Δp) — expect > 0 (modulation pushes probability where DINO disagrees)
    block_cols = delta_img.shape[1]
    if logits_i.shape[1] == block_cols:
        dbg["corr_rhat_dprob_img"] = rowwise_corr(delta_img, p_it - p_i)
    return dbg
