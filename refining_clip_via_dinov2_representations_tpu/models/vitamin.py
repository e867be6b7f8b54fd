"""ViTamin vision towers (timm `vitamin_{small,base,large,large2,xlarge}_*`).

ViTamin (Chen et al., CVPR 2024, arXiv:2404.02132) is a 3-stage hybrid:

  stem        conv3x3 s2 + LN2d/GELU + conv3x3 s1        (H/2)
  stage 1     2 x MBConv-LN blocks (first stride 2)       (H/4)
  stage 2     4 x MBConv-LN blocks (first stride 2)       (H/8)
  embed       LN2d + conv3x3 s2 p1 -> ViT width           (H/16 tokens)
  stage 3     N x ViT blocks with GeGLU FFN (ratio 2,
              inner pre-LN), no class token
  head        global average pool -> LN (fc_norm) -> proj

MBConv-LN streamlines MobileNet's inverted bottleneck: ONE pre-LayerNorm
replaces the three BatchNorms; 1x1 expand (ratio 4) -> GELU -> 3x3 depthwise
-> GELU -> 1x1 project, residual around it (avg-pool + 1x1 shortcut on
stride/width changes).

ORACLE STATUS: no timm/torch ViTamin exists in this environment (zero
egress), so this port is reconstructed from the paper + the published timm
structure and is structurally tested only (shapes, stage strides, GeGLU
gating, converter roundtrip on synthetic timm-layout dicts). Value-level
verification against real checkpoints is REQUIRED before trusting converted
weights — flagged here and in COMPONENTS.md, same protocol as the EVA
family. Known-uncertain points are marked UNVERIFIED below.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn

from .transformer import _remat
import jax
import jax.numpy as jnp
import numpy as np

from .layers import LayerNorm


@dataclasses.dataclass(frozen=True)
class ViTaminCfg:
    stem_width: int
    conv_dims: Tuple[int, int]
    conv_depths: Tuple[int, int]
    embed_dim: int
    depth: int
    heads: int
    image_size: int = 224
    mlp_ratio: float = 2.0     # GeGLU hidden ratio
    expand_ratio: float = 4.0  # MBConv expansion
    norm_eps: float = 1e-6


# UNVERIFIED: large2 is mapped to the large trunk (the paper's L2 differs in
# the text tower / training recipe, not the image trunk).
VITAMIN_DIMS: Dict[str, ViTaminCfg] = {}
for _name, _c in {
    "small": ViTaminCfg(64, (64, 128), (2, 4), 384, 14, 6),
    "base": ViTaminCfg(128, (128, 256), (2, 4), 768, 14, 12),
    "large": ViTaminCfg(160, (160, 320), (2, 4), 1024, 31, 16),
    "large2": ViTaminCfg(160, (160, 320), (2, 4), 1024, 31, 16),
    "xlarge": ViTaminCfg(192, (192, 384), (2, 4), 1152, 32, 18),
}.items():
    for _res in (224, 256, 336, 384):
        VITAMIN_DIMS[f"vitamin_{_name}_{_res}"] = dataclasses.replace(
            _c, image_size=_res
        )


def _conv(features, k, s, name, bias=True, groups=1, dtype=jnp.float32):
    return nn.Conv(
        features, (k, k), strides=(s, s),
        padding=((k // 2, k // 2), (k // 2, k // 2)) if k > 1 else "VALID",
        feature_group_count=groups, use_bias=bias, dtype=dtype, name=name,
    )


class MbConvLNBlock(nn.Module):
    out_chs: int
    stride: int = 1
    expand_ratio: float = 4.0
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_chs = x.shape[-1]
        mid = int(round(self.out_chs * self.expand_ratio))
        if self.stride == 2:
            short = nn.avg_pool(x, (2, 2), strides=(2, 2))
            short = _conv(self.out_chs, 1, 1, "shortcut", dtype=self.dtype)(short)
        elif in_chs != self.out_chs:
            short = _conv(self.out_chs, 1, 1, "shortcut", dtype=self.dtype)(x)
        else:
            short = x
        y = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="pre_norm")(x)
        y = _conv(mid, 1, 1, "conv1_1x1", dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=y.dtype == jnp.bfloat16)
        y = _conv(mid, 3, self.stride, "conv2_kxk", groups=mid, dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=y.dtype == jnp.bfloat16)
        y = _conv(self.out_chs, 1, 1, "conv3_1x1", dtype=self.dtype)(y)
        return short + y


class GeGluMlp(nn.Module):
    """ViTamin FFN: inner pre-LN, GeGLU gate, ratio-2 hidden."""

    hidden: int
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")(x)
        gate = nn.Dense(self.hidden, dtype=self.dtype, name="w0")(x)
        val = nn.Dense(self.hidden, dtype=self.dtype, name="w1")(x)
        h = nn.gelu(gate, approximate=gate.dtype == jnp.bfloat16) * val
        return nn.Dense(d, dtype=self.dtype, name="w2")(h)


class ViTaminBlock(nn.Module):
    heads: int
    mlp_ratio: float
    norm_eps: float
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        from .layers import MultiheadAttention

        d = x.shape[-1]
        y = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="ln_1")(x)
        y = MultiheadAttention(
            num_heads=self.heads, dtype=self.dtype, attn_impl=self.attn_impl,
            name="attn",
        )(y)
        x = x + y
        z = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="ln_2")(x)
        z = GeGluMlp(
            hidden=int(d * self.mlp_ratio), norm_eps=self.norm_eps,
            dtype=self.dtype, name="mlp",
        )(z)
        return x + z


class ViTaminVisionTower(nn.Module):
    cfg: ViTaminCfg
    output_dim: int
    proj_bias: bool = False
    output_tokens: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        x = x.astype(self.dtype)
        # stem: /2
        x = _conv(c.stem_width, 3, 2, "stem_conv1", dtype=self.dtype)(x)
        x = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="stem_norm1")(x)
        x = nn.gelu(x, approximate=x.dtype == jnp.bfloat16)
        x = _conv(c.stem_width, 3, 1, "stem_conv2", dtype=self.dtype)(x)
        # conv stages: /4 then /8
        for si, (dim, depth) in enumerate(zip(c.conv_dims, c.conv_depths)):
            for bi in range(depth):
                x = MbConvLNBlock(
                    out_chs=dim, stride=2 if bi == 0 else 1,
                    expand_ratio=c.expand_ratio, norm_eps=c.norm_eps,
                    dtype=self.dtype, name=f"stage{si}_block{bi}",
                )(x)
        # token embed: /16
        x = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="embed_norm")(x)
        x = _conv(c.embed_dim, 3, 2, "embed_conv", dtype=self.dtype)(x)
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, c.embed_dim)

        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.02),
            (gh * gw, c.embed_dim), jnp.float32,
        )
        x = x + pos.astype(x.dtype)

        block_cls = (
            _remat(ViTaminBlock, self.remat_policy, static_argnums=())
            if self.remat else ViTaminBlock
        )
        for i in range(c.depth):
            x = block_cls(
                heads=c.heads, mlp_ratio=c.mlp_ratio, norm_eps=c.norm_eps,
                dtype=self.dtype, attn_impl=self.attn_impl,
                name=f"resblocks_{i}",
            )(x)

        tokens = x
        pooled = jnp.mean(x, axis=1)
        # fc_norm: LN applied AFTER pooling (timm global_pool='avg' default)
        pooled = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="fc_norm")(pooled)
        pooled = nn.Dense(
            self.output_dim, use_bias=self.proj_bias, dtype=self.dtype, name="proj"
        )(pooled)
        if self.output_tokens:
            return pooled, tokens
        return pooled


def convert_timm_vitamin_state_dict(
    state_dict: Mapping[str, Any], cfg: Optional[ViTaminCfg] = None,
    prefix: str = "visual.trunk.",
) -> Dict[str, Any]:
    """Best-effort timm `vitamin_*` layout mapping. Raises KeyError on any
    unknown key rather than silently dropping it (UNVERIFIED vs real
    checkpoints — see module docstring)."""

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

    def conv_w(val):
        return t(val).transpose(2, 3, 1, 0)  # OIHW -> HWIO

    for key, val in state_dict.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        parts = k.split(".")
        if parts[0] == "patch_embed":
            rest = parts[1:]
            if rest[0] == "backbone":
                rest = rest[1:]
            if rest[0] == "stem":
                sub = {"conv1": "stem_conv1", "conv2": "stem_conv2"}.get(rest[1])
                if sub:
                    leaf = "kernel" if rest[2] == "weight" else "bias"
                    setp([sub, leaf], conv_w(val) if rest[2] == "weight" else t(val))
                elif rest[1] in ("norm1", "norm"):
                    setp(["stem_norm1", "scale" if rest[2] == "weight" else "bias"], t(val))
                else:
                    raise KeyError(key)
            elif rest[0] == "stages":
                si, bi = int(rest[1]), int(rest[3])
                blk = f"stage{si}_block{bi}"
                r = rest[4:]
                if r[0] == "pre_norm":
                    setp([blk, "pre_norm", "scale" if r[1] == "weight" else "bias"], t(val))
                elif r[0] in ("conv1_1x1", "conv2_kxk", "conv3_1x1", "shortcut"):
                    name = r[0]
                    leaf_key = r[-1]
                    # timm shortcut may nest (.conv / .expand); flatten
                    leaf = "kernel" if leaf_key == "weight" else "bias"
                    setp([blk, name, leaf],
                         conv_w(val) if leaf_key == "weight" else t(val))
                else:
                    raise KeyError(key)
            elif rest[0] == "pool":  # StridedConv: norm + proj
                if rest[1] == "norm":
                    setp(["embed_norm", "scale" if rest[2] == "weight" else "bias"], t(val))
                elif rest[1] == "proj":
                    leaf = "kernel" if rest[2] == "weight" else "bias"
                    setp(["embed_conv", leaf],
                         conv_w(val) if rest[2] == "weight" else t(val))
                else:
                    raise KeyError(key)
            else:
                raise KeyError(key)
        elif k == "pos_embed":
            v = t(val)
            setp(["positional_embedding"], v.reshape(v.shape[-2], v.shape[-1]))
        elif parts[0] == "blocks":
            i = int(parts[1])
            blk = f"resblocks_{i}"
            rest = parts[2:]
            if rest[0] in ("norm1", "norm2"):
                name = "ln_1" if rest[0] == "norm1" else "ln_2"
                setp([blk, name, "scale" if rest[1] == "weight" else "bias"], t(val))
            elif rest[0] == "attn":
                if rest[1] == "qkv":
                    if rest[2] == "weight":
                        setp([blk, "attn", "in_proj_kernel"], t(val).T)
                    else:
                        setp([blk, "attn", "in_proj_bias"], t(val))
                elif rest[1] == "proj":
                    leaf = "kernel" if rest[2] == "weight" else "bias"
                    setp([blk, "attn", "out_proj", leaf],
                         t(val).T if rest[2] == "weight" else t(val))
                else:
                    raise KeyError(key)
            elif rest[0] == "mlp":
                if rest[1] == "norm":
                    setp([blk, "mlp", "norm", "scale" if rest[2] == "weight" else "bias"], t(val))
                elif rest[1] in ("w0", "w1", "w2", "fc1_g", "fc1_x", "fc2"):
                    sub = {"fc1_g": "w0", "fc1_x": "w1", "fc2": "w2"}.get(rest[1], rest[1])
                    leaf = "kernel" if rest[2] == "weight" else "bias"
                    setp([blk, "mlp", sub, leaf],
                         t(val).T if rest[2] == "weight" else t(val))
                else:
                    raise KeyError(key)
            else:
                raise KeyError(key)
        elif parts[0] == "fc_norm":
            setp(["fc_norm", "scale" if parts[1] == "weight" else "bias"], t(val))
        elif parts[0] == "norm":
            # trunk norm is Identity under fc_norm in timm's avg-pool config;
            # tolerate checkpoints that serialize it anyway
            import logging

            logging.warning("vitamin converter: ignoring trunk norm key %s", key)
        elif parts[0] == "head":
            leaf = "kernel" if parts[1] == "weight" else "bias"
            setp(["proj", leaf], t(val).T if parts[1] == "weight" else t(val))
        else:
            raise KeyError(key)
    return p


def vitamin_params_to_timm_state_dict(
    visual: Mapping[str, Any], prefix: str = "visual.trunk."
) -> Dict[str, Any]:
    """Inverse of `convert_timm_vitamin_state_dict`: flax ViTamin tower
    params → timm `vitamin_*` layout (MBConv-LN stages under
    `patch_embed.backbone`, GeGLU ViT stage under `blocks`)."""
    sd: Dict[str, Any] = {}

    def put(key, val):
        sd[prefix + key] = np.asarray(val, np.float32)

    def conv_w(k):
        return np.transpose(np.asarray(k, np.float32), (3, 2, 0, 1))  # HWIO->OIHW

    pe = "patch_embed.backbone."
    for name in visual:
        p = visual[name]
        if name in ("stem_conv1", "stem_conv2"):
            torch_name = {"stem_conv1": "conv1", "stem_conv2": "conv2"}[name]
            put(f"{pe}stem.{torch_name}.weight", conv_w(p["kernel"]))
            if "bias" in p:
                put(f"{pe}stem.{torch_name}.bias", p["bias"])
        elif name == "stem_norm1":
            put(f"{pe}stem.norm1.weight", p["scale"])
            put(f"{pe}stem.norm1.bias", p["bias"])
        elif name.startswith("stage") and "_block" in name:
            s, b = name[len("stage"):].split("_block")
            bp = f"{pe}stages.{s}.blocks.{b}"
            put(f"{bp}.pre_norm.weight", p["pre_norm"]["scale"])
            put(f"{bp}.pre_norm.bias", p["pre_norm"]["bias"])
            for conv in ("conv1_1x1", "conv2_kxk", "conv3_1x1", "shortcut"):
                if conv in p:
                    put(f"{bp}.{conv}.weight", conv_w(p[conv]["kernel"]))
                    if "bias" in p[conv]:
                        put(f"{bp}.{conv}.bias", p[conv]["bias"])
        elif name == "embed_norm":
            put("patch_embed.pool.norm.weight", p["scale"])
            put("patch_embed.pool.norm.bias", p["bias"])
        elif name == "embed_conv":
            put("patch_embed.pool.proj.weight", conv_w(p["kernel"]))
            if "bias" in p:
                put("patch_embed.pool.proj.bias", p["bias"])
        elif name == "positional_embedding":
            v = np.asarray(p)
            put("pos_embed", v.reshape(1, *v.shape))
        elif name.startswith("resblocks_"):
            i = name.split("_")[-1]
            bp = f"blocks.{i}"
            put(f"{bp}.norm1.weight", p["ln_1"]["scale"])
            put(f"{bp}.norm1.bias", p["ln_1"]["bias"])
            put(f"{bp}.norm2.weight", p["ln_2"]["scale"])
            put(f"{bp}.norm2.bias", p["ln_2"]["bias"])
            put(f"{bp}.attn.qkv.weight", np.asarray(p["attn"]["in_proj_kernel"]).T)
            if "in_proj_bias" in p["attn"]:
                put(f"{bp}.attn.qkv.bias", p["attn"]["in_proj_bias"])
            put(f"{bp}.attn.proj.weight", np.asarray(p["attn"]["out_proj"]["kernel"]).T)
            if "bias" in p["attn"]["out_proj"]:
                put(f"{bp}.attn.proj.bias", p["attn"]["out_proj"]["bias"])
            mlp = p["mlp"]
            put(f"{bp}.mlp.norm.weight", mlp["norm"]["scale"])
            put(f"{bp}.mlp.norm.bias", mlp["norm"]["bias"])
            for w in ("w0", "w1", "w2"):
                put(f"{bp}.mlp.{w}.weight", np.asarray(mlp[w]["kernel"]).T)
                if "bias" in mlp[w]:
                    put(f"{bp}.mlp.{w}.bias", mlp[w]["bias"])
        elif name == "fc_norm":
            put("fc_norm.weight", p["scale"])
            put("fc_norm.bias", p["bias"])
        elif name == "proj":
            put("head.weight", np.asarray(p["kernel"]).T)
            if "bias" in p:
                put("head.bias", p["bias"])
        else:
            raise KeyError(f"unexported vitamin tower entry {name}")
    return sd
