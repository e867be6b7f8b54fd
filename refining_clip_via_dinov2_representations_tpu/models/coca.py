"""CoCa: contrastive captioner (two towers + multimodal text decoder).

Flax rebuild of `src/open_clip/coca_model.py:89-582`. Structure:
vision tower with attentional pooling and token outputs, text tower with an
appended CLS embedding, and a multimodal decoder (causal self-attention
interleaved with cross-attention to image tokens) projecting to the
vocabulary. Forward semantics match `coca_model.py:251-285` including
teacher-forcing label alignment (`labels = text[:, 1:]`, token embeddings
truncated by one).

DESIGN FIX vs reference: the reference decoder's `text_projection` is
`torch.empty` and its `init_parameters` is never invoked — fresh reference
CoCa models emit uninitialized-memory logits (verified in
tests/test_coca.py). Our decoder initializes the projection properly
(normal, std width^-0.5); converted *trained* checkpoints are unaffected.

Generation is re-designed TPU-native: a fixed-length `lax.scan` decode loop
(greedy / top-k / top-p) instead of the reference's HF
beam-search/logits-processor stack (`coca_model.py:287+`), which is
dynamic-shape torch code. Each step re-runs the decoder on the fixed-size
buffer — O(L²) total but trivially jittable; L is ≤ 77 here.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .clip import (
    DEFAULT_INIT_LOGIT_SCALE,
    _build_text_tower,
    _build_vision_tower,
    _remat_args,
    l2_normalize,
)
from .config import CLIPTextCfg, CLIPVisionCfg, MultimodalCfg
from .layers import get_act_fn
from .transformer import MultimodalTransformer

Dtype = Any


class CoCa(nn.Module):
    embed_dim: int
    vision_cfg: CLIPVisionCfg
    text_cfg: CLIPTextCfg
    multimodal_cfg: MultimodalCfg
    quick_gelu: bool = False
    init_logit_scale: float = DEFAULT_INIT_LOGIT_SCALE
    init_logit_bias: Optional[float] = None
    pad_id: int = 0
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    # bool, or a jax.checkpoint policy name (clip._remat_args)
    remat: Any = False

    def setup(self):
        self.visual = _build_vision_tower(
            self.embed_dim, self.vision_cfg, self.quick_gelu, self.dtype,
            self.attn_impl, self.remat,
        )
        self.text = _build_text_tower(
            self.embed_dim, self.text_cfg, self.quick_gelu, self.dtype,
            self.attn_impl, self.remat,
        )
        act = get_act_fn("quick_gelu" if self.quick_gelu else "gelu")
        self.text_decoder = MultimodalTransformer(
            width=self.multimodal_cfg.width,
            layers=self.multimodal_cfg.layers,
            heads=self.multimodal_cfg.heads,
            context_length=self.multimodal_cfg.context_length,
            mlp_ratio=self.multimodal_cfg.mlp_ratio,
            ls_init_value=self.multimodal_cfg.ls_init_value,
            output_dim=self.text_cfg.vocab_size,  # decoder projects to vocab
            act=act,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=_remat_args(self.remat)[0],
            remat_policy=_remat_args(self.remat)[1],
            name="text_decoder",
        )
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(self.init_logit_scale), (), jnp.float32
        )
        if self.init_logit_bias is not None:
            self.logit_bias = self.param(
                "logit_bias", nn.initializers.constant(self.init_logit_bias), (), jnp.float32
            )
        else:
            self.logit_bias = None

    # -- encoders ----------------------------------------------------------
    def _encode_image(self, images, normalize: bool = True, deterministic: bool = True):
        image_latent, tokens = self.visual(images, deterministic=deterministic)
        if normalize:
            image_latent = l2_normalize(image_latent)
        return image_latent, tokens

    def _encode_text(self, text, normalize: bool = True, deterministic: bool = True):
        text_latent, token_embs = self.text(text, deterministic=deterministic)
        if normalize:
            text_latent = l2_normalize(text_latent)
        return text_latent, token_embs

    def encode_image(self, images, normalize: bool = True, deterministic: bool = True):
        return self._encode_image(images, normalize, deterministic)[0]

    def encode_text(self, text, normalize: bool = True, deterministic: bool = True):
        return self._encode_text(text, normalize, deterministic)[0]

    def decode_logits(self, image, text):
        """Caption logits for a full (image, text-prefix) pair — the decode
        primitive used by `generate`."""
        _, image_embs = self._encode_image(image)
        _, token_embs = self._encode_text(text)
        return self.text_decoder(image_embs, token_embs)

    def __call__(
        self,
        image,
        text: Optional[jnp.ndarray] = None,
        output_labels: bool = True,
        deterministic: bool = True,
    ):
        image_latent, image_embs = self._encode_image(image, deterministic=deterministic)
        if text is None:
            return {"image_features": image_latent, "image_embs": image_embs}

        text_latent, token_embs = self._encode_text(text, deterministic=deterministic)

        labels = None
        if output_labels:
            # teacher forcing: logits at position i predict token i+1
            labels = text[:, 1:]
            token_embs = token_embs[:, :-1]

        logits = self.text_decoder(image_embs, token_embs)
        out = {
            "image_features": image_latent,
            "text_features": text_latent,
            "logits": logits,
            "logit_scale": jnp.exp(self.logit_scale),
        }
        if labels is not None:
            out["labels"] = labels
        if self.logit_bias is not None:
            out["logit_bias"] = self.logit_bias
        return out


def generate(
    model: CoCa,
    variables,
    image: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    seq_len: int = 30,
    temperature: float = 1.0,
    generation_type: str = "top_p",
    top_p: float = 0.1,
    top_k: int = 1,
    sot_token_id: int = 49406,
    eot_token_id: int = 49407,
    pad_token_id: int = 0,
    min_seq_len: int = 5,
) -> jnp.ndarray:
    """Fixed-length jitted caption generation.

    Mirrors `coca_model.generate`'s sampling modes: 'top_k' (k=1 → greedy),
    'top_p' nucleus sampling. Returns [B, seq_len] token ids, EOT-terminated
    and pad-filled.
    """
    b = image.shape[0]
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    # encode image once outside the scan
    image_latent, image_embs = model.apply(
        variables, image, method=lambda m, im: m._encode_image(im)
    )

    def decode_step(tokens):
        _, token_embs = model.apply(
            variables, tokens, method=lambda m, t: m._encode_text(t)
        )
        logits = model.apply(
            variables, image_embs, token_embs,
            method=lambda m, ie, te: m.text_decoder(ie, te),
        )
        return logits

    tokens0 = jnp.full((b, seq_len), pad_token_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(sot_token_id)
    finished0 = jnp.zeros((b,), bool)

    def body(carry, t):
        tokens, finished, rng = carry
        rng, key = jax.random.split(rng)
        logits = decode_step(tokens)  # [B, L', V]
        # position t-1 predicts token t; clamp into the decoder's range
        pos = jnp.minimum(t - 1, logits.shape[1] - 1)
        step_logits = logits[:, pos, :].astype(jnp.float32) / max(temperature, 1e-6)

        # min length: no EOT before min_seq_len
        step_logits = jnp.where(
            (t < min_seq_len)
            & (jnp.arange(step_logits.shape[-1])[None, :] == eot_token_id),
            -jnp.inf,
            step_logits,
        )

        if generation_type == "beam_search":
            raise ValueError("use generate_beam() for beam search")
        if generation_type == "top_k":
            kth = jax.lax.top_k(step_logits, top_k)[0][:, -1:]
            step_logits = jnp.where(step_logits < kth, -jnp.inf, step_logits)
            nxt = (
                jnp.argmax(step_logits, axis=-1)
                if top_k == 1
                else jax.random.categorical(key, step_logits)
            )
        elif generation_type == "top_p":
            sorted_logits = jnp.sort(step_logits, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            # smallest set with cumulative prob >= top_p
            cutoff_idx = jnp.sum(cum < top_p, axis=-1)
            cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
            step_logits = jnp.where(step_logits < cutoff, -jnp.inf, step_logits)
            nxt = jax.random.categorical(key, step_logits)
        else:
            raise ValueError(
                f"generation_type {generation_type!r} not supported; "
                "use 'top_k' (k=1 for greedy) or 'top_p'"
            )

        nxt = jnp.where(finished, pad_token_id, nxt.astype(jnp.int32))
        tokens = tokens.at[:, t].set(nxt)
        finished = finished | (nxt == eot_token_id)
        return (tokens, finished, rng), None

    (tokens, _, _), _ = jax.lax.scan(
        body, (tokens0, finished0, rng), jnp.arange(1, seq_len)
    )
    return tokens


def generate_beam(
    model: CoCa,
    variables,
    image: jnp.ndarray,
    num_beams: int = 6,
    seq_len: int = 30,
    sot_token_id: int = 49406,
    eot_token_id: int = 49407,
    pad_token_id: int = 0,
    min_seq_len: int = 5,
) -> jnp.ndarray:
    """Fixed-width beam search as a `lax.scan` (the reference drives HF's
    BeamSearchScorer, `coca_model.py:287+`; this is the static-shape TPU
    formulation — sum-logprob scoring, no length penalty).

    Returns the best beam per image, [B, seq_len].
    """
    b = image.shape[0]
    w = num_beams

    _, image_embs = model.apply(
        variables, image, method=lambda m, im: m._encode_image(im)
    )
    # replicate image tokens per beam: [B*W, T, D]
    image_embs_rep = jnp.repeat(image_embs, w, axis=0)

    def decode_step(tokens_flat):
        _, token_embs = model.apply(
            variables, tokens_flat, method=lambda m, t: m._encode_text(t)
        )
        return model.apply(
            variables, image_embs_rep, token_embs,
            method=lambda m, ie, te: m.text_decoder(ie, te),
        )

    tokens0 = jnp.full((b, w, seq_len), pad_token_id, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(sot_token_id)
    # only beam 0 is live at t=0 so identical beams don't crowd the top-k
    scores0 = jnp.where(
        jnp.arange(w)[None, :] == 0, 0.0, -jnp.inf
    ).astype(jnp.float32) * jnp.ones((b, 1))
    finished0 = jnp.zeros((b, w), bool)

    neg_inf = jnp.float32(-1e30)

    def body(carry, t):
        tokens, scores, finished = carry
        logits = decode_step(tokens.reshape(b * w, seq_len))
        pos = jnp.minimum(t - 1, logits.shape[1] - 1)
        step = jax.nn.log_softmax(
            logits[:, pos, :].astype(jnp.float32), axis=-1
        ).reshape(b, w, -1)
        v = step.shape[-1]

        # min length: suppress EOT early
        step = jnp.where(
            (t < min_seq_len)
            & (jnp.arange(v)[None, None, :] == eot_token_id),
            neg_inf, step,
        )
        # finished beams: only 'pad' continuation at no cost
        pad_only = jnp.where(
            jnp.arange(v)[None, None, :] == pad_token_id, 0.0, neg_inf
        )
        step = jnp.where(finished[:, :, None], pad_only, step)

        cand = scores[:, :, None] + step            # [B, W, V]
        flat = cand.reshape(b, w * v)
        top_scores, top_idx = jax.lax.top_k(flat, w)  # [B, W]
        beam_idx = top_idx // v
        tok_idx = (top_idx % v).astype(jnp.int32)

        tokens = jnp.take_along_axis(tokens, beam_idx[:, :, None], axis=1)
        finished = jnp.take_along_axis(finished, beam_idx, axis=1)
        tokens = tokens.at[:, :, t].set(
            jnp.where(finished, pad_token_id, tok_idx)
        )
        finished = finished | (tok_idx == eot_token_id)
        return (tokens, top_scores, finished), None

    (tokens, scores, _), _ = jax.lax.scan(
        body, (tokens0, scores0, finished0), jnp.arange(1, seq_len)
    )
    best = jnp.argmax(scores, axis=1)
    return jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
