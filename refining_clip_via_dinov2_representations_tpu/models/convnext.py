"""Native ConvNeXt vision tower (replaces the timm `convnext_*` wrappers).

The reference wraps timm ConvNeXts (`src/open_clip/timm_model.py` with
`pool='', proj='linear'` per the convnext_* registry configs): trunk →
global-average pool → head LayerNorm → linear projection to embed_dim.
This is the NHWC flax implementation, parity-tested against HF
transformers' `ConvNextModel` (same upstream architecture):

  stem: 4x4/4 conv + LN → 4 stages of (optional 2x2/2 downsample with
  pre-LN) + blocks of [7x7 depthwise conv → LN → 1x1 expand (4x) → GELU →
  1x1 project → layer-scale γ → residual].

`convert_timm_convnext_state_dict` maps open_clip-hub checkpoints
(`visual.trunk.*` timm layout + `visual.head.proj`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn

from .transformer import _remat
import jax.numpy as jnp
import numpy as np

from .layers import LayerNorm, gelu

# timm name → (depths, dims)
CONVNEXT_DIMS = {
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
    "convnext_xxlarge": ((3, 4, 30, 3), (384, 768, 1536, 3072)),
}


@dataclasses.dataclass(frozen=True)
class ConvNextCfg:
    depths: Tuple[int, ...] = (3, 3, 27, 3)
    dims: Tuple[int, ...] = (128, 256, 512, 1024)
    norm_eps: float = 1e-6


class _ConvNextBlock(nn.Module):
    dim: int
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype, name="conv_dw")(x)
        h = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="fc1")(h)
        h = gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        gamma = self.param("gamma", nn.initializers.constant(1e-6),
                           (self.dim,), jnp.float32)
        return x + h * gamma.astype(h.dtype)


class ConvNextTower(nn.Module):
    """Trunk + avg-pool + head LN + linear proj (`timm_model.py` head with
    pool='' / proj='linear')."""

    cfg: ConvNextCfg = ConvNextCfg()
    output_dim: int = 640
    proj_type: str = "linear"  # 'linear' | 'mlp' (timm_model.py:98-103)
    proj_bias: bool = False
    output_tokens: bool = False
    dtype: Any = jnp.float32
    remat: bool = False
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, deterministic: bool = True):
        c = self.cfg
        if pixel_values.shape[1] == 3 and pixel_values.shape[-1] != 3:
            pixel_values = jnp.transpose(pixel_values, (0, 2, 3, 1))
        x = pixel_values.astype(self.dtype)

        x = nn.Conv(c.dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="stem_conv")(x)
        x = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="stem_norm")(x)

        block_cls = (
            _remat(_ConvNextBlock, self.remat_policy, static_argnums=())
            if self.remat else _ConvNextBlock
        )
        for s, (depth, dim) in enumerate(zip(c.depths, c.dims)):
            if s > 0:
                x = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype,
                              name=f"downsample_norm_{s}")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"downsample_conv_{s}")(x)
            for b in range(depth):
                x = block_cls(dim=dim, norm_eps=c.norm_eps, dtype=self.dtype,
                              name=f"stage{s}_block{b}")(x)

        tokens = x  # [B, H', W', C]
        pooled = jnp.mean(x, axis=(1, 2))
        pooled = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="head_norm")(pooled)
        if self.proj_type == "mlp":
            pooled = nn.Dense(2 * self.output_dim, dtype=self.dtype,
                              name="head_mlp_fc1")(pooled)
            pooled = gelu(pooled)
            pooled = nn.Dense(self.output_dim, use_bias=self.proj_bias,
                              dtype=self.dtype, name="head_proj")(pooled)
        else:
            pooled = nn.Dense(self.output_dim, use_bias=self.proj_bias,
                              dtype=self.dtype, name="head_proj")(pooled)
        if self.output_tokens:
            return pooled, tokens.reshape(tokens.shape[0], -1, tokens.shape[-1])
        return pooled


def convert_timm_convnext_state_dict(
    state_dict: Mapping[str, Any], trunk_prefix: str = "visual.trunk.",
    head_prefix: str = "visual.head.",
) -> Dict[str, Any]:
    """open_clip-hub ConvNeXt checkpoints (timm layout) → this tower.

    timm naming: stem.0/stem.1, stages.S.downsample.{0 LN,1 conv} (S>=1),
    stages.S.blocks.B.{conv_dw, norm, mlp.fc1, mlp.fc2, gamma},
    head.norm; the projection lives outside the trunk at `visual.head.proj`.
    """

    def t(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().float().numpy()
        return np.asarray(x, np.float32)

    p: Dict[str, Any] = {}

    def setp(path, val):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = val

    def conv_k(w):  # OIHW → HWIO
        return t(w).transpose(2, 3, 1, 0)

    for key, val in state_dict.items():
        if key.startswith(trunk_prefix):
            key2 = key[len(trunk_prefix):]
            parts = key2.split(".")
            if key2 == "stem.0.weight":
                setp(["stem_conv", "kernel"], conv_k(val))
            elif key2 == "stem.0.bias":
                setp(["stem_conv", "bias"], t(val))
            elif parts[0] == "stem" and parts[1] == "1":
                setp(["stem_norm", "scale" if parts[2] == "weight" else "bias"], t(val))
            elif parts[0] == "stages":
                s = int(parts[1])
                if parts[2] == "downsample":
                    if parts[3] == "0":
                        setp([f"downsample_norm_{s}",
                              "scale" if parts[4] == "weight" else "bias"], t(val))
                    else:
                        leaf = "kernel" if parts[4] == "weight" else "bias"
                        setp([f"downsample_conv_{s}", leaf],
                             conv_k(val) if parts[4] == "weight" else t(val))
                elif parts[2] == "blocks":
                    b = int(parts[3])
                    blk = f"stage{s}_block{b}"
                    rest = parts[4:]
                    if rest[0] == "conv_dw":
                        leaf = "kernel" if rest[1] == "weight" else "bias"
                        setp([blk, "conv_dw", leaf],
                             conv_k(val) if rest[1] == "weight" else t(val))
                    elif rest[0] == "norm":
                        setp([blk, "norm", "scale" if rest[1] == "weight" else "bias"], t(val))
                    elif rest[0] == "mlp":
                        leaf = "kernel" if rest[2] == "weight" else "bias"
                        setp([blk, rest[1], leaf],
                             t(val).T if rest[2] == "weight" else t(val))
                    elif rest[0] == "gamma":
                        setp([blk, "gamma"], t(val))
                    else:
                        raise KeyError(key)
                else:
                    raise KeyError(key)
            elif parts[0] == "head" and parts[1] == "norm":
                setp(["head_norm", "scale" if parts[2] == "weight" else "bias"], t(val))
            elif parts[0] == "head" and parts[1] in ("global_pool", "flatten", "drop", "fc"):
                continue
            else:
                raise KeyError(key)
        elif key.startswith(head_prefix + "proj"):
            leaf = "kernel" if key.endswith("weight") else "bias"
            setp(["head_proj", leaf],
                 t(val).T if key.endswith("weight") else t(val))
    return p


def convert_hf_convnext_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """HF ConvNextModel layout → this tower's trunk params (no proj)."""

    def t(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().float().numpy()
        return np.asarray(x, np.float32)

    p: Dict[str, Any] = {}

    def setp(path, val):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = val

    for key, val in state_dict.items():
        key = key.replace("convnext.", "")
        parts = key.split(".")
        if key == "embeddings.patch_embeddings.weight":
            setp(["stem_conv", "kernel"], t(val).transpose(2, 3, 1, 0))
        elif key == "embeddings.patch_embeddings.bias":
            setp(["stem_conv", "bias"], t(val))
        elif parts[0] == "embeddings" and parts[1] == "layernorm":
            setp(["stem_norm", "scale" if parts[2] == "weight" else "bias"], t(val))
        elif parts[0] == "encoder" and parts[1] == "stages":
            s = int(parts[2])
            if parts[3] == "downsampling_layer":
                if parts[4] == "0":
                    setp([f"downsample_norm_{s}",
                          "scale" if parts[5] == "weight" else "bias"], t(val))
                else:
                    leaf = "kernel" if parts[5] == "weight" else "bias"
                    setp([f"downsample_conv_{s}", leaf],
                         t(val).transpose(2, 3, 1, 0) if parts[5] == "weight" else t(val))
            elif parts[3] == "layers":
                b = int(parts[4])
                blk = f"stage{s}_block{b}"
                rest = parts[5:]
                if rest[0] == "dwconv":
                    leaf = "kernel" if rest[1] == "weight" else "bias"
                    setp([blk, "conv_dw", leaf],
                         t(val).transpose(2, 3, 1, 0) if rest[1] == "weight" else t(val))
                elif rest[0] == "layernorm":
                    setp([blk, "norm", "scale" if rest[1] == "weight" else "bias"], t(val))
                elif rest[0] in ("pwconv1", "pwconv2"):
                    name = "fc1" if rest[0] == "pwconv1" else "fc2"
                    leaf = "kernel" if rest[1] == "weight" else "bias"
                    setp([blk, name, leaf], t(val).T if rest[1] == "weight" else t(val))
                elif rest[0] == "layer_scale_parameter":
                    setp([blk, "gamma"], t(val))
                else:
                    raise KeyError(key)
            else:
                raise KeyError(key)
        elif parts[0] == "layernorm":  # final LN used by HF pooler
            setp(["head_norm", "scale" if parts[1] == "weight" else "bias"], t(val))
        else:
            raise KeyError(key)
    return p


def convnext_params_to_timm_state_dict(
    visual: Mapping[str, Any], trunk_prefix: str = "visual.trunk.",
    head_prefix: str = "visual.head.",
) -> Dict[str, Any]:
    """Inverse of `convert_timm_convnext_state_dict`: flax tower params →
    timm-layout numpy state dict for torch-interop checkpoint export."""
    sd: Dict[str, Any] = {}

    def put(key, val):
        sd[key] = np.asarray(val, np.float32)

    def conv_k(w):  # HWIO → OIHW
        return np.transpose(np.asarray(w, np.float32), (3, 2, 0, 1))

    put(trunk_prefix + "stem.0.weight", conv_k(visual["stem_conv"]["kernel"]))
    put(trunk_prefix + "stem.0.bias", visual["stem_conv"]["bias"])
    put(trunk_prefix + "stem.1.weight", visual["stem_norm"]["scale"])
    put(trunk_prefix + "stem.1.bias", visual["stem_norm"]["bias"])

    for name in visual:
        if name.startswith("downsample_norm_"):
            s = name.split("_")[-1]
            put(trunk_prefix + f"stages.{s}.downsample.0.weight", visual[name]["scale"])
            put(trunk_prefix + f"stages.{s}.downsample.0.bias", visual[name]["bias"])
        elif name.startswith("downsample_conv_"):
            s = name.split("_")[-1]
            put(trunk_prefix + f"stages.{s}.downsample.1.weight",
                conv_k(visual[name]["kernel"]))
            put(trunk_prefix + f"stages.{s}.downsample.1.bias", visual[name]["bias"])
        elif name.startswith("stage") and "_block" in name:
            s, b = name[len("stage"):].split("_block")
            blk = visual[name]
            tp = trunk_prefix + f"stages.{s}.blocks.{b}"
            put(f"{tp}.conv_dw.weight", conv_k(blk["conv_dw"]["kernel"]))
            put(f"{tp}.conv_dw.bias", blk["conv_dw"]["bias"])
            put(f"{tp}.norm.weight", blk["norm"]["scale"])
            put(f"{tp}.norm.bias", blk["norm"]["bias"])
            put(f"{tp}.mlp.fc1.weight", np.asarray(blk["fc1"]["kernel"]).T)
            put(f"{tp}.mlp.fc1.bias", blk["fc1"]["bias"])
            put(f"{tp}.mlp.fc2.weight", np.asarray(blk["fc2"]["kernel"]).T)
            put(f"{tp}.mlp.fc2.bias", blk["fc2"]["bias"])
            if "gamma" in blk:
                put(f"{tp}.gamma", blk["gamma"])

    put(trunk_prefix + "head.norm.weight", visual["head_norm"]["scale"])
    put(trunk_prefix + "head.norm.bias", visual["head_norm"]["bias"])
    if "head_proj" in visual:
        put(head_prefix + "proj.weight", np.asarray(visual["head_proj"]["kernel"]).T)
        if "bias" in visual["head_proj"]:
            put(head_prefix + "proj.bias", visual["head_proj"]["bias"])
    return sd
