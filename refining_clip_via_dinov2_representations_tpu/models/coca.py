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

Generation is re-designed TPU-native: fixed-length `lax.scan` decode loops
(greedy / top-k / top-p / grouped beam search) instead of the reference's HF
beam-search/logits-processor stack (`coca_model.py:287-560`), which is
dynamic-shape torch code. Each step re-runs the decoder on the fixed-size
buffer — O(L²) total but trivially jittable; L is ≤ 77 here.

`generate_beam` reproduces the reference's `_generate_beamsearch` +
`transformers.BeamSearchScorer` semantics exactly (grouped beams, per-group
hypothesis pools with length-penalty normalization, the early_stopping=False
stop heuristic, EOS appended on finalize) — including the reference's quirk
of summing RAW logits as beam scores (`coca_model.py:497-500` applies no
log_softmax before adding `beam_scores`, unlike HF's canonical beam search);
pass `log_softmax_scores=True` for the fixed behavior. Note the in-env
`transformers` (>=4.49) no longer top-level-exports `BeamSearchScorer`, so
the reference's own beam path is dead under it (`coca_model.py:17-43` falls
into the ImportError branch and `generate` asserts); the parity test injects
the symbols from `transformers.generation.beam_search` to run it.
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


def _apply_repetition_penalty(step_logits, seen, penalty):
    """HF `RepetitionPenaltyLogitsProcessor`: scores of already-seen tokens
    are multiplied by `penalty` when negative, divided when positive."""
    penalized = jnp.where(
        step_logits < 0, step_logits * penalty, step_logits / penalty
    )
    return jnp.where(seen, penalized, step_logits)


def top_k_filter(step_logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """HF `TopKLogitsWarper`: mask logits below the k-th largest to -inf
    (ties with the k-th value survive). [..., V] -> [..., V]."""
    kth = jax.lax.top_k(step_logits, top_k)[0][..., -1:]
    return jnp.where(step_logits < kth, -jnp.inf, step_logits)


def _init_caches(b: int, layers: int, heads: int, width: int, length: int, dtype):
    """Zeroed per-layer (k, v) caches, [B, H, L, Dh] each."""
    z = jnp.zeros((b, heads, length, width // heads), dtype)
    return [(z, z) for _ in range(layers)]


def top_p_filter(step_logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """HF `TopPLogitsWarper`: keep the smallest descending-sorted set whose
    cumulative softmax probability reaches `top_p` (the boundary token is
    kept), mask the rest to -inf. [..., V] -> [..., V]."""
    sorted_logits = jnp.sort(step_logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    return jnp.where(step_logits < cutoff, -jnp.inf, step_logits)


def generate(
    model: CoCa,
    variables,
    image: jnp.ndarray,
    text: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    seq_len: int = 30,
    temperature: float = 1.0,
    generation_type: str = "beam_search",
    top_p: float = 0.1,
    top_k: int = 1,
    sot_token_id: int = 49406,
    eot_token_id: int = 49407,
    pad_token_id: int = 0,
    num_beams: int = 6,
    num_beam_groups: int = 3,
    min_seq_len: int = 5,
    repetition_penalty: float = 1.0,
    length_penalty: float = 1.0,
    use_cache: bool = True,
) -> jnp.ndarray:
    """Fixed-length jitted caption generation.

    Mirrors `coca_model.generate` (`coca_model.py:286-410`): modes
    'beam_search' (default, dispatches to :func:`generate_beam`), 'top_k'
    (k=1 → greedy), 'top_p' nucleus sampling. Logits-processor order matches
    the reference: min-length EOT mask → repetition penalty → top-k/top-p
    warp on the RAW logits → temperature → sample; the final position is
    forced to EOT for unfinished rows (`coca_model.py:396-397`). Returns
    [B, seq_len] token ids, EOT-terminated and pad-filled (the reference's
    `fixed_output_length=True` shape).

    `text` optionally seeds the sampling modes with a token-id prompt
    ([B, P] or [P], continued in the output like `coca_model.py:363-366`;
    a single prompt is tiled across the batch — a superset of the
    reference, which only accepts 1-D text with one image). The beam mode
    ignores it, as the reference's `_generate_beamsearch` does.

    `use_cache=True` (default) decodes incrementally through per-layer KV
    caches carried in the scan — O(L) transformer work instead of the O(L²)
    full re-decode, same tokens (token-equality tested) — falling back to
    the re-decode for HF/non-causal text towers.
    """
    if seq_len <= min_seq_len:
        raise ValueError("seq_len must be larger than min_seq_len")
    if generation_type == "beam_search":
        return generate_beam(
            model, variables, image,
            num_beams=num_beams, num_beam_groups=num_beam_groups,
            seq_len=seq_len, sot_token_id=sot_token_id,
            eot_token_id=eot_token_id, pad_token_id=pad_token_id,
            min_seq_len=min_seq_len, repetition_penalty=repetition_penalty,
            length_penalty=length_penalty, use_cache=use_cache,
        )
    if generation_type not in ("top_k", "top_p"):
        raise ValueError(
            f"generation_type {generation_type!r} not supported; use "
            "'beam_search', 'top_k' (k=1 for greedy) or 'top_p'"
        )

    ctx = model.text_cfg.context_length
    if seq_len > ctx:
        # the fixed decode buffer has no sliding window (the reference crops
        # to max_seq_len=77); past the positional range the cached path's
        # clamped dynamic slices would silently produce wrong embeddings
        raise ValueError(
            f"seq_len {seq_len} exceeds the text tower's context_length {ctx}"
        )
    b = image.shape[0]
    vocab = model.text_cfg.vocab_size
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    use_rep = repetition_penalty != 1.0

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
    if text is not None:
        prompt = jnp.asarray(text, jnp.int32)
        if prompt.ndim == 1:
            prompt = prompt[None, :]
        if prompt.shape[0] == 1 and b > 1:
            prompt = jnp.tile(prompt, (b, 1))
        start = prompt.shape[1]
        if not 0 < start < seq_len:
            raise ValueError(
                f"prompt length {start} must be in [1, seq_len={seq_len})"
            )
        tokens0 = tokens0.at[:, :start].set(prompt)
        # a prompt already ending in EOT/PAD is finished (the reference's
        # last-token mask, `coca_model.py:385`)
        finished0 = (prompt[:, -1] == eot_token_id) | (prompt[:, -1] == pad_token_id)
        seen0 = (jax.nn.one_hot(prompt, vocab, dtype=bool).any(axis=1)
                 if use_rep else None)
    else:
        start = 1
        tokens0 = tokens0.at[:, 0].set(sot_token_id)
        finished0 = jnp.zeros((b,), bool)
        # the seen accumulator only exists for the repetition penalty —
        # carrying + one_hot'ing a [B, vocab] buffer per step is pure waste
        # at the default penalty of 1.0 (None is an empty scan-carry leaf)
        seen0 = (jnp.zeros((b, vocab), bool).at[:, sot_token_id].set(True)
                 if use_rep else None)

    def choose(step_logits, tw, finished, seen, key):
        """The per-position sampling rule (reference order: min-length mask →
        repetition penalty → warp raw logits → temperature → sample; forced
        EOT at the final position, PAD for finished rows). `tw` = position
        being written."""
        # min length: no EOT before min_seq_len (MinLengthLogitsProcessor)
        step_logits = jnp.where(
            (tw < min_seq_len)
            & (jnp.arange(step_logits.shape[-1])[None, :] == eot_token_id),
            -jnp.inf,
            step_logits,
        )
        if use_rep:
            step_logits = _apply_repetition_penalty(
                step_logits, seen, repetition_penalty
            )
        if generation_type == "top_k":
            step_logits = top_k_filter(step_logits, top_k)
            nxt = (
                jnp.argmax(step_logits, axis=-1)
                if top_k == 1
                else jax.random.categorical(
                    key, step_logits / max(temperature, 1e-6)
                )
            )
        else:  # top_p
            step_logits = top_p_filter(step_logits, top_p)
            nxt = jax.random.categorical(
                key, step_logits / max(temperature, 1e-6)
            )
        # the reference forces EOT at the final generated position
        nxt = jnp.where(tw == seq_len - 1, eot_token_id, nxt)
        return jnp.where(finished, pad_token_id, nxt.astype(jnp.int32))

    can_cache = (
        use_cache
        and model.text_cfg.hf_model_name is None
        and not model.text_cfg.no_causal_mask
    )

    if can_cache:
        # Incremental decode: one token per step through KV caches — O(L)
        # total transformer work instead of the O(L²) full re-decode. The
        # scan starts at position 0 so prompt tokens prefill the caches
        # (forced writes, no sampling).
        tcaches0 = _init_caches(
            b, model.text_cfg.layers, model.text_cfg.heads,
            model.text_cfg.width, seq_len, model.dtype,
        )
        dcaches0 = _init_caches(
            b, model.multimodal_cfg.layers, model.multimodal_cfg.heads,
            model.multimodal_cfg.width, seq_len, model.dtype,
        )
        cur0 = tokens0[:, 0:1]
        # the cross-attention K/V of the fixed image tokens never change —
        # project them once, reuse in every decode step
        cross = model.apply(
            variables, image_embs,
            method=lambda m, ie: m.text_decoder(ie, None, compute_cross_kv=True),
        )

        def body(carry, t):
            tokens, finished, seen, cur, tcaches, dcaches = carry
            emb, tcaches = model.apply(
                variables, cur, tcaches, t,
                method=lambda m, tok, c, p: m.text(tok, caches=c, pos=p),
            )
            logits, dcaches = model.apply(
                variables, None, emb, dcaches, t, cross,
                method=lambda m, ie, te, c, p, cc: m.text_decoder(
                    ie, te, caches=c, pos=p, cross_caches=cc
                ),
            )
            tw = t + 1  # logits at position t predict token t+1
            key = jax.random.fold_in(rng, tw)
            sampled = choose(
                logits[:, 0].astype(jnp.float32), tw, finished, seen, key
            )
            forced = jax.lax.dynamic_slice_in_dim(tokens, tw, 1, axis=1)[:, 0]
            is_forced = tw < start  # prompt prefill
            nxt = jnp.where(is_forced, forced, sampled)
            tokens = tokens.at[:, tw].set(nxt)
            # reference-faithful: a sampled PAD also terminates the row
            # (`coca_model.py:385` masks rows whose last token is eos OR pad)
            finished = finished | (
                ~is_forced & ((nxt == eot_token_id) | (nxt == pad_token_id))
            )
            if use_rep:
                seen = seen | jax.nn.one_hot(nxt, vocab, dtype=bool)
            return (tokens, finished, seen, nxt[:, None], tcaches, dcaches), None

        (tokens, _, _, _, _, _), _ = jax.lax.scan(
            body, (tokens0, finished0, seen0, cur0, tcaches0, dcaches0),
            jnp.arange(0, seq_len - 1),
        )
        return tokens

    def body(carry, t):
        tokens, finished, seen = carry
        key = jax.random.fold_in(rng, t)
        logits = decode_step(tokens)  # [B, L', V]
        # position t-1 predicts token t; clamp into the decoder's range
        pos = jnp.minimum(t - 1, logits.shape[1] - 1)
        nxt = choose(logits[:, pos, :].astype(jnp.float32), t, finished, seen, key)
        tokens = tokens.at[:, t].set(nxt)
        # reference-faithful: a sampled PAD also terminates the row
        # (`coca_model.py:385` masks rows whose last token is eos OR pad)
        finished = finished | (nxt == eot_token_id) | (nxt == pad_token_id)
        if use_rep:
            seen = seen | jax.nn.one_hot(nxt, vocab, dtype=bool)
        return (tokens, finished, seen), None

    (tokens, _, _), _ = jax.lax.scan(
        body, (tokens0, finished0, seen0), jnp.arange(start, seq_len)
    )
    return tokens


def generate_beam(
    model: CoCa,
    variables,
    image: jnp.ndarray,
    num_beams: int = 6,
    num_beam_groups: int = 3,
    seq_len: int = 30,
    sot_token_id: int = 49406,
    eot_token_id: int = 49407,
    pad_token_id: int = 0,
    min_seq_len: int = 5,
    repetition_penalty: float = 1.0,
    length_penalty: float = 1.0,
    log_softmax_scores: bool = False,
    use_cache: bool = True,
) -> jnp.ndarray:
    """Grouped beam search as a `lax.scan` — the static-shape TPU
    formulation of the reference's `_generate_beamsearch`
    (`coca_model.py:413-560`) driving HF's `BeamSearchScorer`.

    Semantics reproduced exactly (token-for-token parity-tested against the
    reference in tests/test_coca.py):

    - `num_beams` split into `num_beam_groups` groups searched independently
      (the reference passes no diversity processor, so groups only interact
      at finalize); the first beam of each group starts at score 0, the rest
      at -1e9 (`coca_model.py:458-461`).
    - Beam scores are sums of RAW logits — the reference applies no
      log_softmax (`coca_model.py:497-500`), unlike canonical HF beam
      search. `log_softmax_scores=True` switches to the fixed behavior.
    - Per step each group draws the top `2*group_size` candidates; EOT
      candidates ranked below `group_size` enter the group's hypothesis pool
      with score `sum / generated_len**length_penalty` (generated_len counts
      SOT + tokens + the EOT), others are skipped, and the best
      `group_size` non-EOT candidates refill the live beams
      (`BeamSearchScorer.process`).
    - A group stops (early_stopping=False heuristic) once its pool is full
      and the worst pooled score >= best_candidate / cur_len**penalty.
    - Finalize adds the live beams of unfinished groups (normalized by the
      full length), picks the best pooled hypothesis across groups, and
      appends EOT when it fits (`BeamSearchScorer.finalize`).

    Ties in the candidate top-k resolve to the lowest index (HF iterates in
    rank order — identical); ties in the final best-hypothesis pick resolve
    to the FIRST group (HF's stable sort pops the last — exact-tie order is
    the one measure-zero divergence).

    Returns the best hypothesis per image, [B, seq_len] (the reference's
    `fixed_output_length=True` shape), EOT-terminated and pad-filled.

    `use_cache=True` (default) decodes incrementally through per-beam KV
    caches reordered with the beams each step — O(L) transformer work
    instead of the O(L²) full re-decode, same tokens (token-equality
    tested) — falling back to the re-decode for HF/non-causal text towers.
    """
    b = image.shape[0]
    w = num_beams
    g = num_beam_groups
    if w <= 1:
        raise ValueError("num_beams must be > 1 (use top_k=1 for greedy)")
    if g > w or w % g != 0:
        raise ValueError(
            "num_beam_groups must divide num_beams "
            f"(got {g} groups of {w} beams)"
        )
    if seq_len <= min_seq_len:
        raise ValueError("seq_len must be larger than min_seq_len")
    if seq_len > model.text_cfg.context_length:
        raise ValueError(
            f"seq_len {seq_len} exceeds the text tower's context_length "
            f"{model.text_cfg.context_length}"
        )
    s = w // g  # group size
    L = seq_len
    vocab = model.text_cfg.vocab_size
    use_rep = repetition_penalty != 1.0
    neg_init = jnp.float32(-1e9)  # reference's non-first-beam init score

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

    # live beams, groups-major: beam w belongs to group w // s
    tokens0 = jnp.full((b, w, L), pad_token_id, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(sot_token_id)
    scores0 = jnp.where(jnp.arange(w)[None, :] % s == 0, 0.0, neg_init) * jnp.ones(
        (b, 1), jnp.float32
    )
    done0 = jnp.zeros((b, g), bool)
    # per-group hypothesis pool (S slots, kept sorted best-first by top_k)
    hyp_scores0 = jnp.full((b, g, s), -jnp.inf, jnp.float32)
    hyp_tokens0 = jnp.full((b, g, s, L), pad_token_id, jnp.int32)
    hyp_len0 = jnp.zeros((b, g, s), jnp.int32)
    seen0 = (jnp.zeros((b, w, vocab), bool).at[:, :, sot_token_id].set(True)
             if use_rep else None)  # penalty-only accumulator (see generate)

    def merge_pool(pool, adds):
        """Keep the best S of (existing pool + new adds); existing slots are
        listed first so top_k's lowest-index tie rule prefers them (HF's
        `add` rejects a new hypothesis that merely equals the worst)."""
        hyp_scores, hyp_tokens, hyp_len = pool
        add_sc, add_tok, add_len = adds
        all_sc = jnp.concatenate([hyp_scores, add_sc], axis=2)
        all_tok = jnp.concatenate([hyp_tokens, add_tok], axis=2)
        all_len = jnp.concatenate([hyp_len, add_len], axis=2)
        new_sc, keep = jax.lax.top_k(all_sc, s)  # [B, G, S]
        new_tok = jnp.take_along_axis(all_tok, keep[..., None], axis=2)
        new_len = jnp.take_along_axis(all_len, keep, axis=2)
        return new_sc, new_tok, new_len

    def process(step, tw, state):
        """One BeamSearchScorer.process step given raw step logits `step`
        [B, W, V] for the position preceding `tw` (the position being
        written). Returns the updated beam state plus the (idx, write_tok)
        pair the cached path needs to reorder its KV caches."""
        tokens, scores, done, hyp_scores, hyp_tokens, hyp_len, seen = state
        if log_softmax_scores:
            step = jax.nn.log_softmax(step, axis=-1)

        # logits processors, reference order: min-length then repetition
        step = jnp.where(
            (tw < min_seq_len)
            & (jnp.arange(vocab)[None, None, :] == eot_token_id),
            -jnp.inf, step,
        )
        if use_rep:
            step = _apply_repetition_penalty(step, seen, repetition_penalty)

        cand = (scores[:, :, None] + step).reshape(b, g, s * vocab)
        top_sc, top_ix = jax.lax.top_k(cand, 2 * s)  # [B, G, 2S] sorted desc
        src = top_ix // vocab  # source beam, group-local
        tok = (top_ix % vocab).astype(jnp.int32)
        is_eot = tok == eot_token_id

        # --- live-beam refill: first S non-EOT candidates in rank order
        rank = jnp.arange(2 * s)[None, None, :]
        sel = jnp.argsort(rank + is_eot * (4 * s), axis=-1)[..., :s]  # [B,G,S]
        live_sc = jnp.take_along_axis(top_sc, sel, axis=-1)
        live_tok = jnp.take_along_axis(tok, sel, axis=-1)
        live_src = jnp.take_along_axis(src, sel, axis=-1)

        # --- hypothesis adds: EOT candidates ranked < S (process())
        add_mask = is_eot[..., :s] & ~done[..., None]  # [B, G, S]
        gen_len = (tw + 1).astype(jnp.float32)  # prefix tw tokens + the EOT
        add_sc = jnp.where(
            add_mask, top_sc[..., :s] / gen_len ** length_penalty, -jnp.inf
        )
        tok_g = tokens.reshape(b, g, s, L)
        add_tok = jnp.take_along_axis(tok_g, src[..., :s, None], axis=2)
        add_tok = jnp.where(jnp.arange(L)[None, None, None, :] < tw,
                            add_tok, pad_token_id)
        add_len = jnp.where(add_mask, tw, 0)
        hyp_scores, hyp_tokens, hyp_len = merge_pool(
            (hyp_scores, hyp_tokens, hyp_len), (add_sc, add_tok, add_len)
        )

        # --- stop heuristic (BeamHypotheses.is_done, early_stopping=False)
        full = jnp.sum(hyp_scores > -jnp.inf, axis=-1) >= s
        worst = hyp_scores[..., -1]  # sorted desc -> last is worst
        best_possible = top_sc[..., 0] / gen_len ** length_penalty
        done = done | (full & (worst >= best_possible))

        # --- write step (done groups freeze: identity gather, pad token)
        idx = jnp.where(done[..., None], jnp.arange(s)[None, None, :], live_src)
        tok_g = jnp.take_along_axis(tok_g, idx[..., None], axis=2)
        write_tok = jnp.where(done[..., None], pad_token_id, live_tok)
        tok_g = tok_g.at[:, :, :, tw].set(write_tok)
        tokens = tok_g.reshape(b, w, L)
        scores = jnp.where(
            done[..., None], scores.reshape(b, g, s), live_sc
        ).reshape(b, w)
        if use_rep:
            seen = jnp.take_along_axis(
                seen.reshape(b, g, s, vocab), idx[..., None], axis=2
            )
            seen = (seen | jax.nn.one_hot(write_tok, vocab, dtype=bool)
                    ).reshape(b, w, vocab)
        state = (tokens, scores, done, hyp_scores, hyp_tokens, hyp_len, seen)
        return state, idx, write_tok

    state0 = (tokens0, scores0, done0, hyp_scores0, hyp_tokens0, hyp_len0, seen0)
    can_cache = (
        use_cache
        and model.text_cfg.hf_model_name is None
        and not model.text_cfg.no_causal_mask
    )

    if can_cache:
        # Incremental decode: per-beam KV caches carried in the scan and
        # reordered with the beams each step — O(L) transformer work
        # instead of the O(L²) full re-decode. Same tokens (tested).
        tcaches0 = _init_caches(
            b * w, model.text_cfg.layers, model.text_cfg.heads,
            model.text_cfg.width, L, model.dtype,
        )
        dcaches0 = _init_caches(
            b * w, model.multimodal_cfg.layers, model.multimodal_cfg.heads,
            model.multimodal_cfg.width, L, model.dtype,
        )
        cur0 = tokens0.reshape(b * w, L)[:, 0:1]
        # cross K/V of the fixed image tokens: projected once, beam-invariant
        # (identical for every beam of an image), so never reordered
        cross = model.apply(
            variables, image_embs_rep,
            method=lambda m, ie: m.text_decoder(ie, None, compute_cross_kv=True),
        )

        def reorder(cache, idx):
            k, v = cache

            def take(a):
                a = a.reshape(b, g, s, *a.shape[1:])
                a = jnp.take_along_axis(
                    a, idx.reshape(b, g, s, 1, 1, 1), axis=2
                )
                return a.reshape(b * w, *a.shape[3:])

            return take(k), take(v)

        def body(carry, t):
            state, cur, tcaches, dcaches = carry
            emb, tcaches = model.apply(
                variables, cur, tcaches, t,
                method=lambda m, tok, c, p: m.text(tok, caches=c, pos=p),
            )
            logits, dcaches = model.apply(
                variables, None, emb, dcaches, t, cross,
                method=lambda m, ie, te, c, p, cc: m.text_decoder(
                    ie, te, caches=c, pos=p, cross_caches=cc
                ),
            )
            step = logits[:, 0].astype(jnp.float32).reshape(b, w, vocab)
            state, idx, write_tok = process(step, t + 1, state)
            tcaches = [reorder(c, idx) for c in tcaches]
            dcaches = [reorder(c, idx) for c in dcaches]
            cur = write_tok.reshape(b * w, 1)
            return (state, cur, tcaches, dcaches), None

        (state, _, _, _), _ = jax.lax.scan(
            body, (state0, cur0, tcaches0, dcaches0), jnp.arange(0, L - 1)
        )
    else:
        def body(carry, t):
            logits = decode_step(carry[0].reshape(b * w, L))
            pos = jnp.minimum(t - 1, logits.shape[1] - 1)
            step = logits[:, pos, :].astype(jnp.float32).reshape(b, w, vocab)
            state, _, _ = process(step, t, carry)
            return state, None

        state, _ = jax.lax.scan(body, state0, jnp.arange(1, L))

    tokens, scores, done, hyp_scores, hyp_tokens, hyp_len, _ = state

    # --- finalize: live beams of unfinished groups join the pool at full len
    fin_sc = jnp.where(
        ~done[..., None],
        scores.reshape(b, g, s) / jnp.float32(L) ** length_penalty,
        -jnp.inf,
    )
    fin_len = jnp.where(~done[..., None], L, 0).astype(jnp.int32)
    hyp_scores, hyp_tokens, hyp_len = merge_pool(
        (hyp_scores, hyp_tokens, hyp_len),
        (fin_sc, tokens.reshape(b, g, s, L), fin_len),
    )

    # best pooled hypothesis across groups; append EOT when it fits
    flat_sc = hyp_scores.reshape(b, g * s)
    best = jnp.argmax(flat_sc, axis=-1)
    best_tok = jnp.take_along_axis(
        hyp_tokens.reshape(b, g * s, L), best[:, None, None], axis=1
    )[:, 0]
    best_len = jnp.take_along_axis(
        hyp_len.reshape(b, g * s), best[:, None], axis=1
    )[:, 0]
    pos = jnp.arange(L)[None, :]
    return jnp.where(
        pos < best_len[:, None], best_tok,
        jnp.where(pos == best_len[:, None], eot_token_id, pad_token_id),
    ).astype(jnp.int32)
