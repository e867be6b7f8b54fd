"""Native SigLIP vision tower (replaces the timm `vit_*_siglip_*` wrappers).

The reference consumes SigLIP vision encoders through timm
(`src/open_clip/timm_model.py` + the `ViT-*-SigLIP*` registry configs). This
module is the TPU-native tower with the same math, validated against HF
transformers' `SiglipVisionModel`:

  conv patchify (bias, VALID) → learnable pos embed (no CLS) → pre-LN
  blocks (separate q/k/v in HF; fused here) → post-LN → MAP attention
  pooling head (latent probe, MHA, LN+MLP residual) → pooled [B, D].

`SIGLIP_TIMM_DIMS` maps the timm model names appearing in the registry
configs to architecture dims so `create_model("ViT-B-16-SigLIP")` builds
natively. `convert_hf_siglip_vision_state_dict` loads HF checkpoints.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn

from .transformer import _remat
import jax.numpy as jnp
import numpy as np

from .layers import LayerNorm, MultiheadAttention

# timm model name → (width, layers, heads, mlp_dim)
_SIGLIP_FAMILY_DIMS = {
    "base": (768, 12, 12, 3072),
    "large": (1024, 24, 16, 4096),
    "so400m": (1152, 27, 16, 4304),
    "giantopt": (1536, 40, 16, 6144),
}

_TIMM_RE = re.compile(r"^vit_(base|large|so400m|giantopt)_patch(\d+)_siglip(_gap)?_(\d+)$")


def parse_siglip_timm_name(name: str) -> Optional[Dict[str, int]]:
    """Resolve a timm `vit_*_siglip_*` name to native tower dims."""
    m = _TIMM_RE.match(name)
    if not m:
        # names without trailing resolution, e.g. vit_base_patch16_siglip_224
        return None
    if m.group(3):
        # `_gap` checkpoints use global average pooling and carry no MAP-head
        # weights — silently building the MAP tower would leave its
        # probe/head params randomly initialized on load
        raise NotImplementedError(
            f"{name}: timm `_gap` SigLIP variants (global-average-pooled, no "
            "attention-pool head) are not ported; use the MAP-head variant"
        )
    family, patch, res = m.group(1), int(m.group(2)), int(m.group(4))
    width, layers, heads, mlp = _SIGLIP_FAMILY_DIMS[family]
    return {
        "width": width, "layers": layers, "heads": heads, "mlp_dim": mlp,
        "patch_size": patch, "image_size": res,
    }


def gelu_tanh(x):
    import jax

    return jax.nn.gelu(x, approximate=True)  # HF 'gelu_pytorch_tanh'


@dataclasses.dataclass(frozen=True)
class SiglipVisionCfg:
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    patch_size: int = 16
    image_size: int = 224
    norm_eps: float = 1e-6


class _SiglipBlock(nn.Module):
    cfg: SiglipVisionCfg
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = MultiheadAttention(num_heads=c.heads, dtype=self.dtype,
                               attn_impl=self.attn_impl, name="attn")(
            LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="layer_norm1")(x)
        )
        x = x + h
        y = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="layer_norm2")(x)
        y = nn.Dense(c.mlp_dim, dtype=self.dtype, name="fc1")(y)
        y = gelu_tanh(y)
        y = nn.Dense(c.width, dtype=self.dtype, name="fc2")(y)
        return x + y


class SiglipVisionTower(nn.Module):
    """HF `SiglipVisionModel`-equivalent tower with MAP pooling head."""

    cfg: SiglipVisionCfg = SiglipVisionCfg()
    output_tokens: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, deterministic: bool = True):
        c = self.cfg
        if pixel_values.shape[1] == 3 and pixel_values.shape[-1] != 3:
            pixel_values = jnp.transpose(pixel_values, (0, 2, 3, 1))
        x = pixel_values.astype(self.dtype)
        b, h, w, _ = x.shape
        gh, gw = h // c.patch_size, w // c.patch_size

        x = nn.Conv(c.width, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    dtype=self.dtype, name="patch_embedding")(x)
        x = x.reshape(b, gh * gw, c.width)

        n_native = (c.image_size // c.patch_size) ** 2
        pos = self.param("position_embedding",
                         nn.initializers.normal(stddev=0.02),
                         (n_native, c.width), jnp.float32)
        if gh * gw != n_native:
            import jax

            side = c.image_size // c.patch_size
            pos_r = jax.image.resize(
                pos.reshape(side, side, c.width), (gh, gw, c.width), method="cubic"
            ).reshape(gh * gw, c.width)
        else:
            pos_r = pos
        x = x + pos_r.astype(x.dtype)

        block_cls = _SiglipBlock
        if self.remat:
            block_cls = _remat(_SiglipBlock, self.remat_policy, static_argnums=())
        for i in range(c.layers):
            x = block_cls(cfg=c, dtype=self.dtype, attn_impl=self.attn_impl,
                          name=f"layers_{i}")(x)

        tokens = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype,
                           name="post_layernorm")(x)

        # MAP head (HF SiglipMultiheadAttentionPoolingHead)
        probe = self.param("probe", nn.initializers.normal(stddev=0.02),
                           (1, c.width), jnp.float32)
        q = jnp.broadcast_to(probe.astype(tokens.dtype), (b, 1, c.width))
        hidden = MultiheadAttention(num_heads=c.heads, dtype=self.dtype,
                                    attn_impl=self.attn_impl, name="head_attn")(
            q, kv=tokens
        )
        residual = hidden
        hidden = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype,
                           name="head_layernorm")(hidden)
        hidden = nn.Dense(c.mlp_dim, dtype=self.dtype, name="head_fc1")(hidden)
        hidden = gelu_tanh(hidden)
        hidden = nn.Dense(c.width, dtype=self.dtype, name="head_fc2")(hidden)
        pooled = (residual + hidden)[:, 0]

        if self.output_tokens:
            return pooled, tokens
        return pooled


def convert_hf_siglip_vision_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """HF SiglipVisionModel state dict → this tower's param tree."""

    def t(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().float().numpy()
        return np.asarray(x, np.float32)

    p: Dict[str, Any] = {}
    qkv: Dict[str, Dict[str, np.ndarray]] = {}

    def setp(path, val):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = val

    for key, val in state_dict.items():
        key = key.replace("vision_model.", "")
        parts = key.split(".")
        if key == "embeddings.patch_embedding.weight":
            setp(["patch_embedding", "kernel"], t(val).transpose(2, 3, 1, 0))
        elif key == "embeddings.patch_embedding.bias":
            setp(["patch_embedding", "bias"], t(val))
        elif key == "embeddings.position_embedding.weight":
            setp(["position_embedding"], t(val))
        elif parts[0] == "encoder" and parts[1] == "layers":
            i = parts[2]
            blk = f"layers_{i}"
            rest = parts[3:]
            if rest[0] in ("layer_norm1", "layer_norm2"):
                setp([blk, rest[0], "scale" if rest[1] == "weight" else "bias"], t(val))
            elif rest[0] == "self_attn":
                proj = rest[1]
                if proj in ("q_proj", "k_proj", "v_proj"):
                    qkv.setdefault(blk, {})[f"{proj}.{rest[2]}"] = t(val)
                elif proj == "out_proj":
                    leaf = "kernel" if rest[2] == "weight" else "bias"
                    v2 = t(val).T if rest[2] == "weight" else t(val)
                    setp([blk, "attn", "out_proj", leaf], v2)
            elif rest[0] == "mlp":
                leaf = "kernel" if rest[2] == "weight" else "bias"
                v2 = t(val).T if rest[2] == "weight" else t(val)
                setp([blk, rest[1], leaf], v2)
            else:
                raise KeyError(key)
        elif parts[0] == "post_layernorm":
            setp(["post_layernorm", "scale" if parts[1] == "weight" else "bias"], t(val))
        elif parts[0] == "head":
            rest = parts[1:]
            if rest[0] == "probe":
                setp(["probe"], t(val).reshape(1, -1))
            elif rest[0] == "attention":
                if rest[1] == "in_proj_weight":
                    setp(["head_attn", "in_proj_kernel"], t(val).T)
                elif rest[1] == "in_proj_bias":
                    setp(["head_attn", "in_proj_bias"], t(val))
                elif rest[1] == "out_proj":
                    leaf = "kernel" if rest[2] == "weight" else "bias"
                    v2 = t(val).T if rest[2] == "weight" else t(val)
                    setp(["head_attn", "out_proj", leaf], v2)
            elif rest[0] == "layernorm":
                setp(["head_layernorm", "scale" if rest[1] == "weight" else "bias"], t(val))
            elif rest[0] == "mlp":
                leaf = "kernel" if rest[2] == "weight" else "bias"
                v2 = t(val).T if rest[2] == "weight" else t(val)
                setp([f"head_{rest[1]}", leaf], v2)
            else:
                raise KeyError(key)
        else:
            raise KeyError(key)

    # fuse q/k/v into our (D, 3D) layout
    for blk, parts_d in qkv.items():
        kernel = np.concatenate(
            [parts_d["q_proj.weight"].T, parts_d["k_proj.weight"].T,
             parts_d["v_proj.weight"].T], axis=1,
        )
        bias = np.concatenate(
            [parts_d["q_proj.bias"], parts_d["k_proj.bias"], parts_d["v_proj.bias"]]
        )
        node = p.setdefault(blk, {}).setdefault("attn", {})
        node["in_proj_kernel"] = kernel
        node["in_proj_bias"] = bias
    return p


def convert_timm_siglip_vision_state_dict(
    state_dict: Mapping[str, Any], prefix: str = "visual.trunk."
) -> Dict[str, Any]:
    """open_clip-hub SigLIP checkpoints store the vision tower in timm layout
    (`visual.trunk.*`; reference `timm_model.py`). Map it onto this tower.

    timm naming: patch_embed.proj, pos_embed [1,N,D], blocks.N.{norm1,
    attn.qkv, attn.proj, norm2, mlp.fc1/fc2}, norm, attn_pool.{latent, q,
    kv, proj, norm, mlp.fc1/fc2}. timm's MAP head uses separate q (latent)
    and fused kv projections — refused here into our fused QKV layout.
    """

    def t(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().float().numpy()
        return np.asarray(x, np.float32)

    p: Dict[str, Any] = {}
    head_q: Dict[str, np.ndarray] = {}
    head_kv: Dict[str, np.ndarray] = {}

    def setp(path, val):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = val

    for key, val in state_dict.items():
        if not key.startswith(prefix):
            continue
        key = key[len(prefix):]
        parts = key.split(".")
        if key == "patch_embed.proj.weight":
            setp(["patch_embedding", "kernel"], t(val).transpose(2, 3, 1, 0))
        elif key == "patch_embed.proj.bias":
            setp(["patch_embedding", "bias"], t(val))
        elif key == "pos_embed":
            v = t(val)
            setp(["position_embedding"], v.reshape(v.shape[-2], v.shape[-1]))
        elif parts[0] == "blocks":
            i = parts[1]
            blk = f"layers_{i}"
            rest = parts[2:]
            if rest[0] in ("norm1", "norm2"):
                name = "layer_norm1" if rest[0] == "norm1" else "layer_norm2"
                setp([blk, name, "scale" if rest[1] == "weight" else "bias"], t(val))
            elif rest[0] == "attn" and rest[1] == "qkv":
                if rest[2] == "weight":
                    setp([blk, "attn", "in_proj_kernel"], t(val).T)
                else:
                    setp([blk, "attn", "in_proj_bias"], t(val))
            elif rest[0] == "attn" and rest[1] == "proj":
                leaf = "kernel" if rest[2] == "weight" else "bias"
                setp([blk, "attn", "out_proj", leaf],
                     t(val).T if rest[2] == "weight" else t(val))
            elif rest[0] == "mlp":
                leaf = "kernel" if rest[2] == "weight" else "bias"
                setp([blk, rest[1], leaf], t(val).T if rest[2] == "weight" else t(val))
            else:
                raise KeyError(prefix + key)
        elif parts[0] == "norm":
            setp(["post_layernorm", "scale" if parts[1] == "weight" else "bias"], t(val))
        elif parts[0] == "attn_pool":
            rest = parts[1:]
            if rest[0] == "latent":
                setp(["probe"], t(val).reshape(1, -1))
            elif rest[0] == "q":
                head_q[rest[1]] = t(val)
            elif rest[0] == "kv":
                head_kv[rest[1]] = t(val)
            elif rest[0] == "proj":
                leaf = "kernel" if rest[1] == "weight" else "bias"
                setp(["head_attn", "out_proj", leaf],
                     t(val).T if rest[1] == "weight" else t(val))
            elif rest[0] == "norm":
                setp(["head_layernorm", "scale" if rest[1] == "weight" else "bias"], t(val))
            elif rest[0] == "mlp":
                leaf = "kernel" if rest[2] == "weight" else "bias"
                setp([f"head_{rest[1]}", leaf],
                     t(val).T if rest[2] == "weight" else t(val))
            else:
                raise KeyError(prefix + key)
        else:
            raise KeyError(prefix + key)

    if head_q and head_kv:
        d = head_q["weight"].shape[0]
        kernel = np.concatenate(
            [head_q["weight"].T, head_kv["weight"][:d].T, head_kv["weight"][d:].T],
            axis=1,
        )
        bias = np.concatenate([head_q["bias"], head_kv["bias"]])
        node = p.setdefault("head_attn", {})
        node["in_proj_kernel"] = kernel
        node["in_proj_bias"] = bias
    return p


def siglip_vision_params_to_timm_state_dict(
    visual: Mapping[str, Any], prefix: str = "visual.trunk."
) -> Dict[str, Any]:
    """Inverse of `convert_timm_siglip_vision_state_dict`: flax tower params
    → timm-layout numpy state dict (`visual.trunk.*`), for torch-interop
    checkpoint export. Roundtrips losslessly through the importer."""
    sd: Dict[str, Any] = {}

    def put(key, val):
        sd[prefix + key] = np.asarray(val, np.float32)

    put("patch_embed.proj.weight",
        np.transpose(np.asarray(visual["patch_embedding"]["kernel"]), (3, 2, 0, 1)))
    put("patch_embed.proj.bias", visual["patch_embedding"]["bias"])
    pe = np.asarray(visual["position_embedding"])
    put("pos_embed", pe.reshape(1, *pe.shape))

    for name in sorted(k for k in visual if k.startswith("layers_")):
        i = name.split("_")[1]
        blk, tp = visual[name], f"blocks.{i}"
        put(f"{tp}.norm1.weight", blk["layer_norm1"]["scale"])
        put(f"{tp}.norm1.bias", blk["layer_norm1"]["bias"])
        put(f"{tp}.norm2.weight", blk["layer_norm2"]["scale"])
        put(f"{tp}.norm2.bias", blk["layer_norm2"]["bias"])
        put(f"{tp}.attn.qkv.weight", np.asarray(blk["attn"]["in_proj_kernel"]).T)
        put(f"{tp}.attn.qkv.bias", blk["attn"]["in_proj_bias"])
        put(f"{tp}.attn.proj.weight", np.asarray(blk["attn"]["out_proj"]["kernel"]).T)
        put(f"{tp}.attn.proj.bias", blk["attn"]["out_proj"]["bias"])
        put(f"{tp}.mlp.fc1.weight", np.asarray(blk["fc1"]["kernel"]).T)
        put(f"{tp}.mlp.fc1.bias", blk["fc1"]["bias"])
        put(f"{tp}.mlp.fc2.weight", np.asarray(blk["fc2"]["kernel"]).T)
        put(f"{tp}.mlp.fc2.bias", blk["fc2"]["bias"])

    put("norm.weight", visual["post_layernorm"]["scale"])
    put("norm.bias", visual["post_layernorm"]["bias"])

    # MAP pooling head: split our fused QKV back into timm's q + fused kv
    probe = np.asarray(visual["probe"])
    put("attn_pool.latent", probe.reshape(1, 1, -1))
    ha = visual["head_attn"]
    kernel = np.asarray(ha["in_proj_kernel"])  # [D, 3D]
    bias = np.asarray(ha["in_proj_bias"])      # [3D]
    d = kernel.shape[0]
    put("attn_pool.q.weight", kernel[:, :d].T)
    put("attn_pool.q.bias", bias[:d])
    put("attn_pool.kv.weight",
        np.concatenate([kernel[:, d:2 * d].T, kernel[:, 2 * d:].T], axis=0))
    put("attn_pool.kv.bias", bias[d:])
    put("attn_pool.proj.weight", np.asarray(ha["out_proj"]["kernel"]).T)
    put("attn_pool.proj.bias", ha["out_proj"]["bias"])
    put("attn_pool.norm.weight", visual["head_layernorm"]["scale"])
    put("attn_pool.norm.bias", visual["head_layernorm"]["bias"])
    put("attn_pool.mlp.fc1.weight", np.asarray(visual["head_fc1"]["kernel"]).T)
    put("attn_pool.mlp.fc1.bias", visual["head_fc1"]["bias"])
    put("attn_pool.mlp.fc2.weight", np.asarray(visual["head_fc2"]["kernel"]).T)
    put("attn_pool.mlp.fc2.bias", visual["head_fc2"]["bias"])
    return sd
