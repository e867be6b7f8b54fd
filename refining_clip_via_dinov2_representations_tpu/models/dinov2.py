"""DINOv2 vision transformer — the frozen structural teacher.

TPU-native implementation of the teacher the reference consumes through HF
(`src/open_clip_train/dino_features_etc.py:10-33`, `facebook/dinov2-small`):
patch-14 ViT, CLS + learned pos embed (bicubically interpolated off-224),
pre-LN blocks with LayerScale, fp32-stats LayerNorm (eps 1e-6), CLS-token
features. The giant variant's SwiGLU FFN is supported.

`convert_dinov2_state_dict` maps HF `Dinov2Model` weights onto this module;
`load_dinov2_model` builds from a HF checkpoint (hub-cached or local dir).
Run it under `stop_gradient` / frozen params — there is no trainable use.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import LayerNorm, LayerScale, MultiheadAttention, gelu

# name → (hidden, layers, heads, swiglu)
DINOV2_CONFIGS = {
    "facebook/dinov2-small": (384, 12, 6, False),
    "facebook/dinov2-base": (768, 12, 12, False),
    "facebook/dinov2-large": (1024, 24, 16, False),
    "facebook/dinov2-giant": (1536, 40, 24, True),
}

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class Dinov2Cfg:
    hidden_size: int = 384
    layers: int = 12
    heads: int = 6
    patch_size: int = 14
    mlp_ratio: float = 4.0
    layerscale_value: float = 1.0
    norm_eps: float = 1e-6
    use_swiglu_ffn: bool = False
    # resolution the checkpoint's pos-embed table was trained at
    native_image_size: int = 224


class _SwiGLUFFN(nn.Module):
    hidden_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = (int(self.hidden_features * 2 / 3) + 7) // 8 * 8  # dinov2 rounding
        x12 = nn.Dense(2 * h, dtype=self.dtype, name="weights_in")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(d, dtype=self.dtype, name="weights_out")(nn.silu(x1) * x2)


class Dinov2Block(nn.Module):
    cfg: Dinov2Cfg
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = MultiheadAttention(
            num_heads=c.heads, dtype=self.dtype, attn_impl=self.attn_impl, name="attn"
        )(LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="norm1")(x))
        h = LayerScale(c.layerscale_value, name="ls1", dtype=self.dtype)(h)
        x = x + h

        y = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="norm2")(x)
        if c.use_swiglu_ffn:
            y = _SwiGLUFFN(int(c.hidden_size * c.mlp_ratio), dtype=self.dtype, name="mlp")(y)
        else:
            y = nn.Dense(int(c.hidden_size * c.mlp_ratio), dtype=self.dtype, name="fc1")(y)
            y = gelu(y)
            y = nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(y)
        y = LayerScale(c.layerscale_value, name="ls2", dtype=self.dtype)(y)
        return x + y


class Dinov2(nn.Module):
    cfg: Dinov2Cfg = Dinov2Cfg()
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, output_tokens: bool = False):
        """pixel_values: NHWC, already imagenet-normalized. Returns CLS
        features [B, D] (or (cls, tokens))."""
        c = self.cfg
        if pixel_values.shape[1] == 3 and pixel_values.shape[-1] != 3:
            pixel_values = jnp.transpose(pixel_values, (0, 2, 3, 1))
        x = pixel_values.astype(self.dtype)
        b, h, w, _ = x.shape
        gh, gw = h // c.patch_size, w // c.patch_size

        x = nn.Conv(
            c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(b, gh * gw, c.hidden_size)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (c.hidden_size,), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(x.dtype), (b, 1, c.hidden_size)), x],
            axis=1,
        )

        # pos embed stored at the checkpoint-native grid; bicubic off-grid
        native = c.native_image_size // c.patch_size
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(stddev=0.02),
            (native * native + 1, c.hidden_size),
            jnp.float32,
        )
        if (gh, gw) != (native, native):
            cls_pos, grid_pos = pos[:1], pos[1:]
            grid_pos = jax.image.resize(
                grid_pos.reshape(native, native, c.hidden_size),
                (gh, gw, c.hidden_size),
                method="cubic",
            ).reshape(gh * gw, c.hidden_size)
            pos = jnp.concatenate([cls_pos, grid_pos], axis=0)
        x = x + pos.astype(x.dtype)

        for i in range(c.layers):
            x = Dinov2Block(cfg=c, dtype=self.dtype, attn_impl=self.attn_impl,
                            name=f"blocks_{i}")(x)

        x = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="norm")(x)
        cls = x[:, 0]
        if output_tokens:
            return cls, x[:, 1:]
        return cls


def dinov2_cfg_from_name(name: str) -> Dinov2Cfg:
    hidden, layers, heads, swiglu = DINOV2_CONFIGS[name]
    return Dinov2Cfg(hidden_size=hidden, layers=layers, heads=heads, use_swiglu_ffn=swiglu)


def convert_dinov2_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """HF Dinov2Model state dict → this module's param tree."""

    def t(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().float().numpy()
        return np.asarray(x, np.float32)

    params: Dict[str, Any] = {}
    blocks: Dict[str, Dict] = {}
    qkv: Dict[str, Dict[str, np.ndarray]] = {}

    for key, val in state_dict.items():
        parts = key.split(".")
        if key == "embeddings.cls_token":
            params["cls_token"] = t(val).reshape(-1)
        elif key == "embeddings.position_embeddings":
            params["position_embeddings"] = t(val).reshape(t(val).shape[-2], -1)
        elif key == "embeddings.mask_token":
            continue
        elif key.startswith("embeddings.patch_embeddings.projection"):
            if parts[-1] == "weight":
                params.setdefault("patch_embed", {})["kernel"] = t(val).transpose(2, 3, 1, 0)
            else:
                params.setdefault("patch_embed", {})["bias"] = t(val)
        elif key.startswith("layernorm."):
            params.setdefault("norm", {})["scale" if parts[-1] == "weight" else "bias"] = t(val)
        elif parts[0] == "encoder" and parts[1] == "layer":
            i = parts[2]
            blk = blocks.setdefault(f"blocks_{i}", {})
            rest = parts[3:]
            if rest[0] in ("norm1", "norm2"):
                blk.setdefault(rest[0], {})["scale" if rest[1] == "weight" else "bias"] = t(val)
            elif rest[0] == "attention" and rest[1] == "attention":
                q = qkv.setdefault(f"blocks_{i}", {})
                q[f"{rest[2]}.{rest[3]}"] = t(val)
            elif rest[0] == "attention" and rest[1] == "output":
                blk.setdefault("attn", {}).setdefault("out_proj", {})[
                    "kernel" if rest[3] == "weight" else "bias"
                ] = t(val).T if rest[3] == "weight" else t(val)
            elif rest[0] in ("layer_scale1", "layer_scale2"):
                name = "ls1" if rest[0] == "layer_scale1" else "ls2"
                blk.setdefault(name, {})["gamma"] = t(val)
            elif rest[0] == "mlp" and rest[1] in ("fc1", "fc2"):
                blk.setdefault(rest[1], {})[
                    "kernel" if rest[2] == "weight" else "bias"
                ] = t(val).T if rest[2] == "weight" else t(val)
            elif rest[0] == "mlp" and rest[1] in ("weights_in", "weights_out"):
                blk.setdefault("mlp", {}).setdefault(rest[1], {})[
                    "kernel" if rest[2] == "weight" else "bias"
                ] = t(val).T if rest[2] == "weight" else t(val)
            else:
                raise KeyError(f"unhandled DINOv2 key {key}")
        elif key.startswith("pooler."):
            continue  # unused pooler head
        else:
            raise KeyError(f"unhandled DINOv2 key {key}")

    for name, q in qkv.items():
        kernel = np.concatenate(
            [q["query.weight"].T, q["key.weight"].T, q["value.weight"].T], axis=1
        )
        bias = np.concatenate([q["query.bias"], q["key.bias"], q["value.bias"]])
        blocks[name].setdefault("attn", {})["in_proj_kernel"] = kernel
        blocks[name]["attn"]["in_proj_bias"] = bias

    params.update(blocks)
    return params


def load_dinov2_model(
    model_name: str = "facebook/dinov2-small",
    dtype=jnp.float32,
    cache_dir: Optional[str] = None,
):
    """Build (module, variables) from HF weights (`load_dino_model`,
    `dino_features_etc.py:10-14`). Requires hub cache or local files."""
    from transformers import Dinov2Model

    hf = Dinov2Model.from_pretrained(model_name, cache_dir=cache_dir)
    cfg = Dinov2Cfg(
        hidden_size=hf.config.hidden_size,
        layers=hf.config.num_hidden_layers,
        heads=hf.config.num_attention_heads,
        patch_size=hf.config.patch_size,
        mlp_ratio=hf.config.mlp_ratio,
        layerscale_value=hf.config.layerscale_value,
        norm_eps=hf.config.layer_norm_eps,
        use_swiglu_ffn=hf.config.use_swiglu_ffn,
        native_image_size=hf.config.image_size,
    )
    model = Dinov2(cfg=cfg, dtype=dtype)
    params = convert_dinov2_state_dict(hf.state_dict())
    return model, {"params": params}
