"""HuggingFace text tower (flax-native).

Counterpart of `src/open_clip/hf_model.py` (`HFTextEncoder`,
`hf_model.py:96-193`): wrap any HF masked-LM/encoder architecture as the
CLIP text tower with a pooler + projection head. The reference wraps torch
`AutoModel`; here the tower is the model's *flax* module
(`FlaxAutoModel(...).module`), so the whole CLIP remains one jittable flax
tree — no torch in the compute path.

Poolers (`hf_model.py:46-94`): mean_pooler (attention-masked mean),
max_pooler, cls_pooler (first token). Projection: 'linear' or 'mlp' with
hidden (d+out)//2 (`hf_model.py:139-151`).
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


def mean_pooler(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    mask = attention_mask[..., None].astype(hidden.dtype)
    return jnp.sum(hidden * mask, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1e-6)


def max_pooler(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    neg = jnp.finfo(hidden.dtype).min
    masked = jnp.where(attention_mask[..., None] > 0, hidden, neg)
    return jnp.max(masked, axis=1)


def cls_pooler(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    return hidden[:, 0]


POOLERS = {
    "mean_pooler": mean_pooler,
    "max_pooler": max_pooler,
    "cls_pooler": cls_pooler,
    "cls_last_hidden_state_pooler": cls_pooler,
}


class HFTextEncoder(nn.Module):
    """HF flax encoder + pooler + projection as a CLIP text tower.

    `hf_module` is the inner flax module (e.g. `FlaxBertModel(cfg).module`);
    construct via `build_hf_text_tower` to resolve it from a model name.
    """

    hf_module: Any
    output_dim: int
    pooler_type: str = "mean_pooler"
    proj_type: str = "linear"  # 'linear' | 'mlp' | 'none'
    pad_id: int = 0
    output_tokens: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, deterministic: bool = True):
        attention_mask = (input_ids != self.pad_id).astype(jnp.int32)
        Wrapped = type(self.hf_module)
        transformer = Wrapped(
            config=self.hf_module.config, dtype=self.dtype, name="transformer"
        )
        out = transformer(
            input_ids=input_ids,
            attention_mask=attention_mask,
            deterministic=deterministic,
        )
        hidden = out.last_hidden_state
        pooled = POOLERS[self.pooler_type](hidden, attention_mask)

        d = pooled.shape[-1]
        if self.proj_type == "linear" or (self.proj_type != "none" and d != self.output_dim):
            if self.proj_type == "mlp":
                hidden_size = (d + self.output_dim) // 2
                pooled = nn.Dense(hidden_size, use_bias=False, dtype=self.dtype, name="proj_fc1")(pooled)
                pooled = nn.gelu(pooled)
                pooled = nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype, name="proj_fc2")(pooled)
            else:
                pooled = nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype, name="proj")(pooled)

        if self.output_tokens:
            return pooled, hidden
        return pooled


def build_hf_text_tower(
    model_name: str,
    output_dim: int,
    proj_type: Optional[str] = None,
    pooler_type: Optional[str] = None,
    pretrained: bool = True,
    dtype=jnp.float32,
    cache_dir: Optional[str] = None,
):
    """Resolve an HF model name to (HFTextEncoder, pretrained_params|None).

    Requires the model to be hub-cached or a local directory (zero-egress
    environments must pre-download).
    """
    from transformers import AutoConfig, FlaxAutoModel

    config = AutoConfig.from_pretrained(model_name, cache_dir=cache_dir)
    if pooler_type is None:
        pooler_type = ARCH_DICT.get(config.model_type, {}).get("pooler", "mean_pooler")

    if pretrained:
        hf_model = FlaxAutoModel.from_pretrained(model_name, cache_dir=cache_dir)
        hf_params = hf_model.params
    else:
        hf_model = FlaxAutoModel.from_config(config)
        hf_params = None

    tower = HFTextEncoder(
        hf_module=hf_model.module,
        output_dim=output_dim,
        pooler_type=pooler_type,
        proj_type=proj_type or "linear",
        dtype=dtype,
    )
    return tower, hf_params
