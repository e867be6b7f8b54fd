"""Native flax M2M100 encoder — the NLLB text tower.

The reference wraps `facebook/nllb-200-*` through torch `AutoModel`
(`src/open_clip/hf_model.py:96-193` + `hf_configs.py` "m2m_100" entry);
transformers ships NO flax implementation of M2M100, so this file provides a
flax-native encoder with the exact M2M100 architecture (pre-LN transformer
encoder, scaled embeddings, fixed sinusoidal positions with the M2M100
position-id convention), plus a torch→flax state-dict converter so hub
checkpoints load. Only the ENCODER is implemented: CLIP text towers never
run the seq2seq decoder (the reference extracts `.encoder` the same way).

Parity oracle: `tests/test_m2m100.py` checks last_hidden_state against the
torch `M2M100Model` encoder on a tiny random config.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoidal_positions(num_positions: int, dim: int, padding_idx: int) -> np.ndarray:
    """M2M100SinusoidalPositionalEmbedding.get_embedding: [sin | cos] halves
    (NOT interleaved), row `padding_idx` zeroed."""
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64) * -(math.log(10000.0) / (half - 1)))
    ang = np.arange(num_positions, dtype=np.float64)[:, None] * freq[None, :]
    table = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num_positions, 1))], axis=1)
    table[padding_idx] = 0.0
    return table.astype(np.float32)


def position_ids_from_input_ids(input_ids: jnp.ndarray, padding_idx: int) -> jnp.ndarray:
    """Positions count non-pad tokens from `padding_idx + 1`; pads stay at
    `padding_idx` (whose sinusoidal row is zero)."""
    mask = (input_ids != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


class _Output:
    """Duck-typed stand-in for transformers' FlaxBaseModelOutput."""

    def __init__(self, last_hidden_state):
        self.last_hidden_state = last_hidden_state


class FlaxM2M100EncoderModule(nn.Module):
    """M2M100/NLLB encoder as one flax module.

    Accepts a transformers `M2M100Config` (or any object with the same
    attributes). Matches `HFTextEncoder`'s wrapping contract: constructed
    with (config=..., dtype=..., name=...), called with
    (input_ids=, attention_mask=, deterministic=), returns an object with
    `.last_hidden_state`.
    """

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.config
        d = cfg.d_model
        pad = cfg.pad_token_id
        heads = cfg.encoder_attention_heads
        head_dim = d // heads
        if attention_mask is None:
            attention_mask = (input_ids != pad).astype(jnp.int32)

        embed = nn.Embed(
            cfg.vocab_size, d,
            embedding_init=nn.initializers.normal(0.02),
            dtype=self.dtype, name="embed_tokens",
        )
        scale = math.sqrt(d) if cfg.scale_embedding else 1.0
        x = embed(input_ids) * jnp.asarray(scale, self.dtype)

        pos_table = jnp.asarray(
            sinusoidal_positions(cfg.max_position_embeddings + 2, d, pad),
            self.dtype,
        )
        x = x + pos_table[position_ids_from_input_ids(input_ids, pad)]

        # torch M2M100Encoder applies p=cfg.dropout after embed+positions,
        # on every sublayer output, and (attention_dropout) on attn probs;
        # activation_dropout after fc1. All no-ops at eval / rate 0.
        drop = nn.Dropout(getattr(cfg, "dropout", 0.1))
        attn_drop = nn.Dropout(getattr(cfg, "attention_dropout", 0.1))
        act_drop = nn.Dropout(getattr(cfg, "activation_dropout", 0.0))
        x = drop(x, deterministic=deterministic)

        # additive mask [B, 1, 1, L]: 0 keep / big-negative drop
        neg = jnp.finfo(self.dtype).min
        add_mask = (1.0 - attention_mask[:, None, None, :].astype(self.dtype)) * neg

        act = {"relu": nn.relu, "gelu": nn.gelu}[cfg.activation_function]
        for i in range(cfg.encoder_layers):
            layer = f"layers_{i}"
            residual = x
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"{layer}_self_attn_layer_norm")(x)
            q = nn.Dense(d, dtype=self.dtype, name=f"{layer}_q_proj")(h) * (head_dim ** -0.5)
            k = nn.Dense(d, dtype=self.dtype, name=f"{layer}_k_proj")(h)
            v = nn.Dense(d, dtype=self.dtype, name=f"{layer}_v_proj")(h)

            def split(t):
                b, n, _ = t.shape
                return t.reshape(b, n, heads, head_dim).transpose(0, 2, 1, 3)

            attn = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k))
            attn = nn.softmax(attn + add_mask, axis=-1)
            attn = attn_drop(attn, deterministic=deterministic)
            o = jnp.einsum("bhqk,bhkd->bhqd", attn, split(v))
            o = o.transpose(0, 2, 1, 3).reshape(x.shape)
            o = nn.Dense(d, dtype=self.dtype, name=f"{layer}_out_proj")(o)
            x = residual + drop(o, deterministic=deterministic)

            residual = x
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"{layer}_final_layer_norm")(x)
            h = act(nn.Dense(cfg.encoder_ffn_dim, dtype=self.dtype, name=f"{layer}_fc1")(h))
            h = act_drop(h, deterministic=deterministic)
            h = nn.Dense(d, dtype=self.dtype, name=f"{layer}_fc2")(h)
            x = residual + drop(h, deterministic=deterministic)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        return _Output(x)


class FlaxM2M100EncoderModel:
    """Minimal stand-in for a transformers Flax*Model wrapper: exposes
    `.module` (the flax module above), `.config`, and `.params`
    (None unless loaded from a checkpoint)."""

    def __init__(self, config, dtype=jnp.float32, params=None):
        self.config = config
        self.module = FlaxM2M100EncoderModule(config=config, dtype=dtype)
        self.params = params

    @classmethod
    def from_pretrained(cls, model_name: str, cache_dir=None, dtype=jnp.float32):
        """Load the torch checkpoint (hub-cached or local dir) and convert
        the encoder weights. Zero-egress hosts must pre-download."""
        import torch
        from transformers import M2M100Model

        torch_model = M2M100Model.from_pretrained(
            model_name, cache_dir=cache_dir, torch_dtype=torch.float32
        )
        params = convert_m2m100_encoder_state_dict(torch_model.state_dict())
        return cls(torch_model.config, dtype=dtype, params=params)


def convert_m2m100_encoder_state_dict(state_dict) -> dict:
    """torch M2M100Model (or M2M100ForConditionalGeneration) state dict →
    FlaxM2M100EncoderModule params. Decoder weights are ignored."""
    import numpy as _np

    def arr(t):
        return _np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    params: dict = {}
    for key, val in state_dict.items():
        key = key.removeprefix("model.")
        if not (key.startswith("encoder.") or key.startswith("shared.")):
            continue
        if key == "shared.weight" or key == "encoder.embed_tokens.weight":
            params["embed_tokens"] = {"embedding": arr(val)}
            continue
        rest = key.removeprefix("encoder.")
        if rest.startswith("layers."):
            _, idx, *tail = rest.split(".")
            tname = ".".join(tail)
            flat = {
                "self_attn.q_proj": "q_proj", "self_attn.k_proj": "k_proj",
                "self_attn.v_proj": "v_proj", "self_attn.out_proj": "out_proj",
                "self_attn_layer_norm": "self_attn_layer_norm",
                "final_layer_norm": "final_layer_norm",
                "fc1": "fc1", "fc2": "fc2",
            }
            base, leaf = tname.rsplit(".", 1)
            if base not in flat:
                continue
            name = f"layers_{idx}_{flat[base]}"
            node = params.setdefault(name, {})
            a = arr(val)
            if "layer_norm" in base:
                node["scale" if leaf == "weight" else "bias"] = a
            else:
                node["kernel" if leaf == "weight" else "bias"] = (
                    a.T if leaf == "weight" else a
                )
        elif rest.startswith("layer_norm."):
            leaf = rest.split(".")[-1]
            params.setdefault("layer_norm", {})[
                "scale" if leaf == "weight" else "bias"
            ] = arr(val)
        # encoder.embed_positions is a fixed sinusoidal buffer — recomputed
    return params
