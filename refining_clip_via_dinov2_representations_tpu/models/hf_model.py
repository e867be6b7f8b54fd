"""HuggingFace text tower (flax-native).

Counterpart of `src/open_clip/hf_model.py` (`HFTextEncoder`,
`hf_model.py:96-193`): wrap any HF masked-LM/encoder architecture as the
CLIP text tower with a pooler + projection head. The reference wraps torch
`AutoModel`; here the tower is the model's *flax* module
(`FlaxAutoModel(...).module`), so the whole CLIP remains one jittable flax
tree — no torch in the compute path.

Poolers (`hf_model.py:46-94`): mean_pooler (attention-masked mean),
max_pooler, cls_pooler (model pooler_output when present, else first
token — reference `ClsPooler.forward`), cls_last_hidden_state_pooler
(always first token). Projection (`hf_model.py:142-158`): no proj when the
hidden dim equals `output_dim` and no proj type is configured (reference
nn.Identity); 'linear'; or 'mlp' with hidden (d+out)//2 — built whenever
configured, regardless of dims.

Pretrained weights: the reference loads them inside the tower constructor
(`hf_model.py:121-127`). Here module construction is weight-free; the
factory overlays hub weights onto the initialized variables
(`factory.load_hf_pretrained_text_params`) so `create_model` matches the
reference's from-pretrained semantics.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

# arch-specific attribute names (`hf_configs.py:1-67`)
ARCH_DICT = {
    "roberta": {"pooler": "mean_pooler"},
    "xlm-roberta": {"pooler": "mean_pooler"},
    "mt5": {"pooler": "mean_pooler"},
    "t5": {"pooler": "mean_pooler"},
    "bert": {"pooler": "cls_pooler"},
    "m2m_100": {"pooler": "cls_pooler"},
}


def mean_pooler(out, attention_mask: jnp.ndarray) -> jnp.ndarray:
    hidden = out.last_hidden_state
    mask = attention_mask[..., None].astype(hidden.dtype)
    return jnp.sum(hidden * mask, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1e-6)


def max_pooler(out, attention_mask: jnp.ndarray) -> jnp.ndarray:
    hidden = out.last_hidden_state
    neg = jnp.finfo(hidden.dtype).min
    masked = jnp.where(attention_mask[..., None] > 0, hidden, neg)
    return jnp.max(masked, axis=1)


def cls_pooler(out, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Model pooler head (tanh-dense over CLS) when the architecture has one,
    else the raw CLS hidden state — reference `ClsPooler.forward`
    (`hf_model.py:72-80`, use_pooler_output=True)."""
    pooled = getattr(out, "pooler_output", None)
    if pooled is not None:
        return pooled
    return out.last_hidden_state[:, 0]


def cls_last_hidden_state_pooler(out, attention_mask: jnp.ndarray) -> jnp.ndarray:
    return out.last_hidden_state[:, 0]


POOLERS = {
    "mean_pooler": mean_pooler,
    "max_pooler": max_pooler,
    "cls_pooler": cls_pooler,
    "cls_last_hidden_state_pooler": cls_last_hidden_state_pooler,
}

# pooler types whose CLS position is stripped from the returned token stream
# (reference strips for `type(self.pooler) == ClsPooler` ONLY,
# `hf_model.py:160-164` — ClsLastHiddenStatePooler keeps the full stream)
_CLS_STRIPPED = ("cls_pooler",)


class HFTextEncoder(nn.Module):
    """HF flax encoder + pooler + projection as a CLIP text tower.

    `hf_module` is the inner flax module (e.g. `FlaxBertModel(cfg).module`);
    construct via `build_hf_text_tower` to resolve it from a model name.
    """

    hf_module: Any
    output_dim: int
    pooler_type: str = "mean_pooler"
    proj_type: Optional[str] = None  # None | 'linear' | 'mlp' | 'none'
    pad_id: Optional[int] = None  # None → the HF config's pad_token_id
    output_tokens: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, deterministic: bool = True):
        pad_id = self.pad_id
        if pad_id is None:
            # reference masks on the config's pad id (`hf_model.py:156`):
            # roberta pads with 1 (0 is <s>), bert/t5 with 0
            pad_id = getattr(self.hf_module.config, "pad_token_id", None)
            if pad_id is None:
                pad_id = 0
        attention_mask = (input_ids != pad_id).astype(jnp.int32)
        Wrapped = type(self.hf_module)
        wrap_kwargs = {}
        if hasattr(self.hf_module, "add_pooling_layer"):
            wrap_kwargs["add_pooling_layer"] = self.hf_module.add_pooling_layer
        transformer = Wrapped(
            config=self.hf_module.config, dtype=self.dtype, name="transformer",
            **wrap_kwargs,
        )
        out = transformer(
            input_ids=input_ids,
            attention_mask=attention_mask,
            deterministic=deterministic,
        )
        hidden = out.last_hidden_state
        pooled = POOLERS[self.pooler_type](out, attention_mask)

        d = pooled.shape[-1]
        # reference proj resolution (`hf_model.py:142-158`): Identity only
        # for (dims equal AND proj unset); 'linear'/'mlp' always build.
        # 'none' is this port's explicit no-proj (the reference has no such
        # value — unset+mismatched dims crashes there; here it's an error).
        if self.proj_type == "linear":
            pooled = nn.Dense(
                self.output_dim, use_bias=False, dtype=self.dtype, name="proj"
            )(pooled)
        elif self.proj_type == "mlp":
            hidden_size = (d + self.output_dim) // 2
            pooled = nn.Dense(
                hidden_size, use_bias=False, dtype=self.dtype, name="proj_fc1"
            )(pooled)
            pooled = nn.gelu(pooled, approximate=False)
            pooled = nn.Dense(
                self.output_dim, use_bias=False, dtype=self.dtype, name="proj_fc2"
            )(pooled)
        elif self.proj_type in (None, "none"):
            if self.proj_type is None and d != self.output_dim:
                raise ValueError(
                    f"hf text tower pools to {d} but embed_dim={self.output_dim} "
                    "and no hf_proj_type is configured (the reference builds no "
                    "projection here either — set hf_proj_type to 'linear' or "
                    "'mlp')"
                )
        else:
            raise ValueError(f"unknown proj_type {self.proj_type!r}")

        if self.output_tokens:
            tokens = hidden[:, 1:] if self.pooler_type in _CLS_STRIPPED else hidden
            return pooled, tokens
        return pooled


# Frozen architecture hyperparameters of every hub model the 126-config
# registry names (reference `model_configs/*.json` hf_model_name values).
# Used ONLY when the hub config is neither cached nor fetchable — these are
# immutable public architecture constants, so zero-egress hosts can still
# BUILD (fresh-init) every registry config; pretrained WEIGHTS still require
# a warm cache.
_OFFLINE_HF_CONFIGS = {
    "roberta-base": dict(
        model_type="roberta", vocab_size=50265, hidden_size=768,
        num_hidden_layers=12, num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=514, type_vocab_size=1, layer_norm_eps=1e-5,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
    ),
    "xlm-roberta-base": dict(
        model_type="xlm-roberta", vocab_size=250002, hidden_size=768,
        num_hidden_layers=12, num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=514, type_vocab_size=1, layer_norm_eps=1e-5,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
    ),
    "xlm-roberta-large": dict(
        model_type="xlm-roberta", vocab_size=250002, hidden_size=1024,
        num_hidden_layers=24, num_attention_heads=16, intermediate_size=4096,
        max_position_embeddings=514, type_vocab_size=1, layer_norm_eps=1e-5,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
    ),
    "google/mt5-base": dict(
        model_type="mt5", vocab_size=250112, d_model=768, d_kv=64, d_ff=2048,
        num_layers=12, num_decoder_layers=12, num_heads=12,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=1, decoder_start_token_id=0,
    ),
    "google/mt5-xl": dict(
        model_type="mt5", vocab_size=250112, d_model=2048, d_kv=64, d_ff=5120,
        num_layers=24, num_decoder_layers=24, num_heads=32,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=1, decoder_start_token_id=0,
    ),
    "facebook/nllb-200-distilled-600M": dict(
        model_type="m2m_100", vocab_size=256206, d_model=1024,
        encoder_layers=12, decoder_layers=12, encoder_ffn_dim=4096,
        decoder_ffn_dim=4096, encoder_attention_heads=16,
        decoder_attention_heads=16, max_position_embeddings=1024,
        scale_embedding=True, activation_function="relu", pad_token_id=1,
        bos_token_id=0, eos_token_id=2, decoder_start_token_id=2,
    ),
    "facebook/nllb-200-distilled-1.3B": dict(
        model_type="m2m_100", vocab_size=256206, d_model=1024,
        encoder_layers=24, decoder_layers=24, encoder_ffn_dim=8192,
        decoder_ffn_dim=8192, encoder_attention_heads=16,
        decoder_attention_heads=16, max_position_embeddings=1024,
        scale_embedding=True, activation_function="relu", pad_token_id=1,
        bos_token_id=0, eos_token_id=2, decoder_start_token_id=2,
    ),
}


def resolve_hf_config(model_name: str, cache_dir=None):
    """AutoConfig for `model_name` without requiring a network: local HF
    cache first, then the frozen `_OFFLINE_HF_CONFIGS` table for registry
    architectures, then (unknown names only) a live hub fetch."""
    import logging

    from transformers import AutoConfig

    try:
        return AutoConfig.from_pretrained(
            model_name, cache_dir=cache_dir, local_files_only=True
        )
    except Exception:
        pass
    known = _OFFLINE_HF_CONFIGS.get(model_name)
    if known is not None:
        logging.info(
            "hf config %s: not hub-cached; using the built-in architecture "
            "table (identical hyperparameters; pretrained weights still "
            "need a warm cache)", model_name,
        )
        kwargs = dict(known)
        return AutoConfig.for_model(kwargs.pop("model_type"), **kwargs)
    return AutoConfig.from_pretrained(model_name, cache_dir=cache_dir)


def _instantiate_hf(model_name, config, pooler_type, pretrained, cache_dir):
    """Build the flax model for `config`, reference-matching:

    - encoder-only architectures get the pooling-head layout the reference
      uses (`add_pooling_layer=uses_transformer_pooler`, `hf_model.py:126`)
      so converted checkpoints carry no orphan pooler weights;
    - encoder-DECODER architectures (t5/mt5) keep only the encoder, exactly
      as the reference's `self.transformer = self.transformer.encoder`
      (`hf_model.py:129-137`) — via the Flax*EncoderModel classes;
    - m2m_100 (NLLB) has no transformers-flax implementation at all: the
      native `FlaxM2M100EncoderModule` (m2m100.py) fills that hole.
    """
    if config.model_type == "m2m_100":
        from .m2m100 import FlaxM2M100EncoderModel

        if pretrained:
            return FlaxM2M100EncoderModel.from_pretrained(
                model_name, cache_dir=cache_dir
            )
        return FlaxM2M100EncoderModel(config)
    if getattr(config, "is_encoder_decoder", False) and config.model_type in (
        "t5", "mt5",
    ):
        # only the t5 family gets the T5-encoder classes; other
        # encoder-decoder architectures (bart, marian, ...) fall through to
        # FlaxAutoModel, which resolves their own correct class
        from transformers import FlaxMT5EncoderModel, FlaxT5EncoderModel

        cls = FlaxMT5EncoderModel if config.model_type == "mt5" else FlaxT5EncoderModel
        if pretrained:
            return cls.from_pretrained(model_name, cache_dir=cache_dir)
        # _do_init=False: construction stays weight-free (HFTextEncoder only
        # wraps .module; eager init would materialize mt5-xl's 1.2B encoder
        # params just to throw them away)
        return cls(config, _do_init=False)

    from transformers import FlaxAutoModel

    kwargs = {"add_pooling_layer": pooler_type == "cls_pooler"}
    try:
        if pretrained:
            return FlaxAutoModel.from_pretrained(
                model_name, cache_dir=cache_dir, **kwargs
            )
        return FlaxAutoModel.from_config(config, _do_init=False, **kwargs)
    except TypeError:
        # architecture without a pooling-layer knob
        if pretrained:
            return FlaxAutoModel.from_pretrained(model_name, cache_dir=cache_dir)
        return FlaxAutoModel.from_config(config, _do_init=False)


def build_hf_text_tower(
    model_name: str,
    output_dim: int,
    proj_type: Optional[str] = None,
    pooler_type: Optional[str] = None,
    pretrained: bool = True,
    dtype=jnp.float32,
    cache_dir: Optional[str] = None,
    output_tokens: bool = False,
):
    """Resolve an HF model name to (HFTextEncoder, pretrained_params|None).

    With `pretrained=True` the returned params must be overlaid onto the
    initialized variable tree (the factory does this via
    `load_hf_pretrained_text_params`); the module itself is weight-free.
    Architecture configs resolve offline for every registry name
    (`resolve_hf_config`); pretrained WEIGHTS require the model to be
    hub-cached or a local directory (zero-egress hosts must pre-download).
    """
    config = resolve_hf_config(model_name, cache_dir=cache_dir)
    if pooler_type is None:
        pooler_type = ARCH_DICT.get(config.model_type, {}).get("pooler", "mean_pooler")

    hf_model = _instantiate_hf(model_name, config, pooler_type, pretrained, cache_dir)
    hf_params = hf_model.params if pretrained else None

    tower = HFTextEncoder(
        hf_module=hf_model.module,
        output_dim=output_dim,
        pooler_type=pooler_type,
        proj_type=proj_type,
        output_tokens=output_tokens,
        dtype=dtype,
    )
    return tower, hf_params
