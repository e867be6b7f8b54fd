"""EVA02 vision towers (timm `eva02_*_clip_*`) — native flax implementation.

The reference reaches these through `TimmModel`
(`/root/reference/src/open_clip/timm_model.py:23-198`) wrapping timm's Eva.
EVA02's TrV block (EVA-02 paper, arXiv:2303.11331) differs from the vanilla
ViT in three ways, all implemented natively here:

  1. **2D axial rotary position embedding (RoPE)** on q/k, skipping the CLS
     token, with `ref_feat_shape` coordinate normalization (timm
     `RotaryEmbeddingCat` semantics: per-axis frequency bands
     `1/10000**(i/bands)`, interleaved-pair rotation).
  2. **SwiGLU FFN**: `fc2(norm(silu(fc1_g(x)) * fc1_x(x)))` — the inner norm
     is Magneto-style sub-LN (timm `scale_mlp=True`).
  3. **sub-LN in attention** (timm `scale_attn_inner=True`): LayerNorm on the
     merged head outputs before the output projection.

The `eva02_enormous_*` CLIP variant (EVA-CLIP-E) instead uses plain GELU MLP,
no rope, fused qkv, and post-norm blocks (`use_post_norm=True`), matching
timm's `EvaBlockPostNorm`.

Attention q/k/v projections are stored FUSED (`in_proj_kernel` [D, 3D]) like
the rest of this codebase; timm's unfused q/k/v (base/large, where k_proj has
no bias) are concatenated by the converter with the k-bias slice pinned to
zero — numerically identical.

No timm/torch oracle exists in this environment (zero egress); parity is
established structurally + via hand-derived rope/swiglu fixtures
(tests/test_eva02.py) and flagged for value-verification on first real
checkpoint load, same stance as EVA01 (models/eva.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn

from .transformer import _remat
import jax
import jax.numpy as jnp
import numpy as np

from ..utils import to_2tuple
from .layers import LayerNorm, gelu


@dataclasses.dataclass(frozen=True)
class Eva02Cfg:
    width: int
    layers: int
    heads: int
    mlp_hidden: int
    patch_size: int
    image_size: int = 224
    swiglu: bool = True
    rope: bool = True
    subln: bool = True          # sub-LN in attention (scale_attn_inner)
    post_norm: bool = False     # EVA-CLIP-E block style
    ref_feat_shape: Optional[Tuple[int, int]] = (16, 16)
    norm_eps: float = 1e-6
    rope_temperature: float = 10000.0


# timm name -> cfg (hidden = int(width * 4 * 2/3) for SwiGLU variants — the
# EVA-02 paper's parameter-count-preserving rule; E uses a plain 15360 GELU MLP)
EVA02_DIMS: Dict[str, Eva02Cfg] = {
    "eva02_base_patch16_clip_224": Eva02Cfg(
        width=768, layers=12, heads=12, mlp_hidden=2048, patch_size=16
    ),
    "eva02_large_patch14_clip_224": Eva02Cfg(
        width=1024, layers=24, heads=16, mlp_hidden=2730, patch_size=14
    ),
    "eva02_large_patch14_clip_336": Eva02Cfg(
        width=1024, layers=24, heads=16, mlp_hidden=2730, patch_size=14,
        image_size=336,
    ),
    "eva02_enormous_patch14_clip_224": Eva02Cfg(
        width=1792, layers=64, heads=16, mlp_hidden=15360, patch_size=14,
        swiglu=False, rope=False, subln=False, post_norm=True,
        ref_feat_shape=None,
    ),
}


# ---------------------------------------------------------------------------
# 2D axial rope (timm RotaryEmbeddingCat semantics)
# ---------------------------------------------------------------------------

def build_rope_embed(
    grid: Tuple[int, int],
    head_dim: int,
    ref_feat_shape: Optional[Tuple[int, int]],
    temperature: float = 10000.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(sin, cos), each [grid_h*grid_w, head_dim].

    Axial: half the rotation dims encode the y coordinate, half encode x.
    num_bands = head_dim // 4 per axis; each band repeated twice for the
    interleaved-pair rotation convention.
    """
    num_bands = head_dim // 4
    exp = np.arange(num_bands, dtype=np.float64) / num_bands
    bands = 1.0 / (temperature ** exp)  # [bands]

    coords = []
    for axis, size in enumerate(grid):
        t = np.arange(size, dtype=np.float64)
        if ref_feat_shape is not None:
            t = t / size * ref_feat_shape[axis]
        coords.append(t)
    gy, gx = np.meshgrid(coords[0], coords[1], indexing="ij")
    pos = np.stack([gy, gx], axis=-1).reshape(-1, 2)  # [N, 2]

    ang = pos[:, :, None] * bands[None, None, :]       # [N, 2, bands]
    ang = ang.reshape(pos.shape[0], -1)                 # [N, 2*bands]
    sin = np.repeat(np.sin(ang), 2, axis=-1)            # [N, head_dim]
    cos = np.repeat(np.cos(ang), 2, axis=-1)
    return sin.astype(np.float32), cos.astype(np.float32)


def _rotate_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-pair rotation: (x0,x1,x2,x3,...) -> (-x1,x0,-x3,x2,...)."""
    x2 = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1)
    return rot.reshape(x.shape)


def apply_rope(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    """Rotate the patch tokens of x [B, H, 1+N, D]; CLS (index 0) untouched."""
    cls_tok, patches = x[:, :, :1], x[:, :, 1:]
    dtype = x.dtype
    p32 = patches.astype(jnp.float32)
    rotated = p32 * cos + _rotate_pairs(p32) * sin
    return jnp.concatenate([cls_tok, rotated.astype(dtype)], axis=2)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

class Eva02Attention(nn.Module):
    cfg: Eva02Cfg
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, sin=None, cos=None):
        c = self.cfg
        d = c.width
        head_dim = d // c.heads
        in_kernel = self.param(
            "in_proj_kernel",
            nn.initializers.xavier_uniform(),
            (d, 3 * d),
            jnp.float32,
        )
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,), jnp.float32)
        qkv = x @ in_kernel.astype(self.dtype) + in_bias.astype(self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        b, l, _ = x.shape
        split = lambda t: t.reshape(b, l, c.heads, head_dim).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)

        if c.rope and sin is not None:
            q = apply_rope(q, sin, cos)
            k = apply_rope(k, sin, cos)

        from ..ops.attention import multi_head_attention

        out = multi_head_attention(q, k, v, impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        if c.subln:
            out = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="norm")(out)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class Eva02Mlp(nn.Module):
    cfg: Eva02Cfg
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        if c.swiglu:
            gate = nn.Dense(c.mlp_hidden, dtype=self.dtype, name="fc1_g")(x)
            val = nn.Dense(c.mlp_hidden, dtype=self.dtype, name="fc1_x")(x)
            h = nn.silu(gate) * val
            h = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="norm")(h)
            return nn.Dense(c.width, dtype=self.dtype, name="fc2")(h)
        h = nn.Dense(c.mlp_hidden, dtype=self.dtype, name="fc1")(x)
        h = gelu(h)
        return nn.Dense(c.width, dtype=self.dtype, name="fc2")(h)


class Eva02Block(nn.Module):
    cfg: Eva02Cfg
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, sin=None, cos=None):
        c = self.cfg
        attn = Eva02Attention(c, dtype=self.dtype, attn_impl=self.attn_impl, name="attn")
        mlp = Eva02Mlp(c, dtype=self.dtype, name="mlp")
        ln1 = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="ln_1")
        ln2 = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="ln_2")
        if c.post_norm:  # EVA-CLIP-E: norm AFTER the sublayer (timm EvaBlockPostNorm)
            x = x + ln1(attn(x, sin, cos))
            return x + ln2(mlp(x))
        x = x + attn(ln1(x), sin, cos)
        return x + mlp(ln2(x))


class Eva02VisionTower(nn.Module):
    """EVA02 trunk + CLIP projection head (`timm_model.py:56-66` semantics:
    the trunk's classifier head IS the projection when timm_proj is null)."""

    cfg: Eva02Cfg
    output_dim: int
    output_tokens: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        grid = (c.image_size // c.patch_size, c.image_size // c.patch_size)
        n_patches = grid[0] * grid[1]

        x = x.astype(self.dtype)
        x = nn.Conv(
            c.width,
            kernel_size=to_2tuple(c.patch_size),
            strides=to_2tuple(c.patch_size),
            padding="VALID",
            use_bias=True,
            dtype=self.dtype,
            name="conv1",
        )(x)
        b = x.shape[0]
        x = x.reshape(b, n_patches, c.width)

        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.width,), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c.width)), x], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (n_patches + 1, c.width),
            jnp.float32,
        )
        x = x + pos.astype(self.dtype)

        sin = cos = None
        if c.rope:
            head_dim = c.width // c.heads
            sin_np, cos_np = build_rope_embed(
                grid, head_dim, c.ref_feat_shape, c.rope_temperature
            )
            sin, cos = jnp.asarray(sin_np), jnp.asarray(cos_np)

        block_cls = Eva02Block
        if self.remat:
            block_cls = _remat(Eva02Block, self.remat_policy, static_argnums=())
        for i in range(c.layers):
            x = block_cls(
                c, dtype=self.dtype, attn_impl=self.attn_impl, name=f"resblocks_{i}"
            )(x, sin, cos)

        x = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="ln_post")(x)
        pooled, tokens = x[:, 0], x[:, 1:]
        pooled = nn.Dense(self.output_dim, dtype=self.dtype, name="proj")(pooled)
        if self.output_tokens:
            return pooled, tokens
        return pooled


# ---------------------------------------------------------------------------
# Checkpoint conversion (timm Eva state dict -> this module's params)
# ---------------------------------------------------------------------------

def convert_timm_eva02_state_dict(
    state_dict: Mapping[str, Any], cfg: Optional[Eva02Cfg] = None,
    prefix: str = "visual.trunk.",
) -> Dict[str, Any]:
    """Map timm Eva (EVA02) checkpoints. Handles both unfused q/k/v
    projections (base/large; k_proj biasless -> zero slice) and fused qkv
    with separate q/v biases (enormous)."""

    def t(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().float().numpy()
        return np.asarray(x, np.float32)

    p: Dict[str, Any] = {}
    per_block: Dict[str, Dict[str, np.ndarray]] = {}

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
        if key == "cls_token":
            setp(["class_embedding"], t(val).reshape(-1))
        elif key == "pos_embed":
            v = t(val)
            setp(["positional_embedding"], v.reshape(v.shape[-2], v.shape[-1]))
        elif key.startswith("patch_embed.proj."):
            if parts[-1] == "weight":
                setp(["conv1", "kernel"], t(val).transpose(2, 3, 1, 0))
            else:
                setp(["conv1", "bias"], t(val))
        elif parts[0] == "blocks":
            i = parts[1]
            blk = per_block.setdefault(f"resblocks_{i}", {})
            blk[".".join(parts[2:])] = t(val)
        elif parts[0] == "norm":
            setp(["ln_post", "scale" if parts[1] == "weight" else "bias"], t(val))
        elif parts[0] == "head":
            leaf = "kernel" if parts[1] == "weight" else "bias"
            setp(["proj", leaf], t(val).T if parts[1] == "weight" else t(val))
        elif parts[0] == "rope":
            pass  # non-learned buffers; recomputed natively
        else:
            raise KeyError(f"unmapped EVA02 key: {prefix}{key}")

    for bname, raw in per_block.items():
        blk: Dict[str, Any] = {}

        def set_blk(path, val):
            node = blk
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = val

        for key, val in raw.items():
            parts = key.split(".")
            if parts[0] in ("norm1", "norm2"):
                name = "ln_1" if parts[0] == "norm1" else "ln_2"
                set_blk([name, "scale" if parts[1] == "weight" else "bias"], val)
            elif parts[0] == "attn":
                if parts[1] in ("q_proj", "k_proj", "v_proj", "qkv",
                                "q_bias", "v_bias", "k_bias"):
                    continue  # fused below
                if parts[1] == "norm":  # sub-LN
                    set_blk(["attn", "norm",
                             "scale" if parts[2] == "weight" else "bias"], val)
                elif parts[1] == "proj":
                    leaf = "kernel" if parts[2] == "weight" else "bias"
                    set_blk(["attn", "out_proj", leaf],
                            val.T if parts[2] == "weight" else val)
                else:
                    raise KeyError(f"unmapped attn key {key}")
            elif parts[0] == "mlp":
                sub = {"fc1_g": "fc1_g", "fc1_x": "fc1_x", "w1": "fc1_g",
                       "w2": "fc1_x", "fc1": "fc1", "fc2": "fc2",
                       "norm": "norm", "ffn_ln": "norm", "w3": "fc2"}[parts[1]]
                if sub == "norm":
                    set_blk(["mlp", "norm",
                             "scale" if parts[2] == "weight" else "bias"], val)
                else:
                    leaf = "kernel" if parts[2] == "weight" else "bias"
                    set_blk(["mlp", sub, leaf],
                            val.T if parts[2] == "weight" else val)
            elif parts[0] in ("gamma_1", "gamma_2"):
                raise KeyError(
                    "layer-scale EVA02 variants not supported (CLIP variants "
                    f"have no init_values): {key}"
                )
            else:
                raise KeyError(f"unmapped block key {key}")

        # fuse q/k/v
        # width from cfg, else inferred from the checkpoint's cls_token
        d = cfg.width if cfg is not None else int(
            np.asarray(p["class_embedding"]).shape[-1]
        )
        if "attn.qkv.weight" in raw:
            kernel = raw["attn.qkv.weight"].T  # [D, 3D]
            q_b = raw.get("attn.q_bias")
            v_b = raw.get("attn.v_bias")
            if q_b is not None:
                bias = np.concatenate([q_b, np.zeros_like(q_b), v_b])
            else:
                bias = raw.get("attn.qkv.bias", np.zeros(3 * d, np.float32))
        else:
            kernel = np.concatenate(
                [raw["attn.q_proj.weight"].T, raw["attn.k_proj.weight"].T,
                 raw["attn.v_proj.weight"].T], axis=1
            )
            q_b = raw.get("attn.q_proj.bias", np.zeros(d, np.float32))
            k_b = raw.get("attn.k_proj.bias", np.zeros(d, np.float32))
            v_b = raw.get("attn.v_proj.bias", np.zeros(d, np.float32))
            bias = np.concatenate([q_b, k_b, v_b])
        set_blk(["attn", "in_proj_kernel"], kernel)
        set_blk(["attn", "in_proj_bias"], bias)
        p[bname] = blk

    return p  # blocks live at the tree's top level in this tower


def eva02_params_to_timm_state_dict(
    visual: Mapping[str, Any], prefix: str = "visual.trunk."
) -> Dict[str, Any]:
    """Inverse of `convert_timm_eva02_state_dict`: flax EVA02 tower params →
    timm `eva02_*` layout (split q/k/v projections, SwiGLU fc1_g/fc1_x
    naming, sub-LN `attn.norm`/`mlp.norm`).

    timm's k_proj is biasless; our fused in_proj_bias carries a k slice that
    is dropped on export. This is exact for attention outputs — adding a
    constant bias b to every key shifts each logit row by q_i·b, which
    softmax-over-keys cancels — but makes the roundtrip lossless only up to
    that slice.
    """
    sd: Dict[str, Any] = {}

    def put(key, val):
        sd[prefix + key] = np.asarray(val, np.float32)

    put("cls_token", np.asarray(visual["class_embedding"]).reshape(1, 1, -1))
    pe = np.asarray(visual["positional_embedding"])
    put("pos_embed", pe.reshape(1, *pe.shape))
    put("patch_embed.proj.weight",
        np.transpose(np.asarray(visual["conv1"]["kernel"]), (3, 2, 0, 1)))
    if "bias" in visual["conv1"]:
        put("patch_embed.proj.bias", visual["conv1"]["bias"])

    for name in sorted(k for k in visual if k.startswith("resblocks_")):
        i = name.split("_")[-1]
        blk, tp = visual[name], f"blocks.{i}"
        put(f"{tp}.norm1.weight", blk["ln_1"]["scale"])
        put(f"{tp}.norm1.bias", blk["ln_1"]["bias"])
        put(f"{tp}.norm2.weight", blk["ln_2"]["scale"])
        put(f"{tp}.norm2.bias", blk["ln_2"]["bias"])
        kernel = np.asarray(blk["attn"]["in_proj_kernel"])  # [D, 3D]
        bias = np.asarray(blk["attn"]["in_proj_bias"])
        d = kernel.shape[0]
        put(f"{tp}.attn.q_proj.weight", kernel[:, :d].T)
        put(f"{tp}.attn.q_proj.bias", bias[:d])
        put(f"{tp}.attn.k_proj.weight", kernel[:, d:2 * d].T)
        put(f"{tp}.attn.v_proj.weight", kernel[:, 2 * d:].T)
        put(f"{tp}.attn.v_proj.bias", bias[2 * d:])
        if "norm" in blk["attn"]:
            put(f"{tp}.attn.norm.weight", blk["attn"]["norm"]["scale"])
            put(f"{tp}.attn.norm.bias", blk["attn"]["norm"]["bias"])
        put(f"{tp}.attn.proj.weight", np.asarray(blk["attn"]["out_proj"]["kernel"]).T)
        put(f"{tp}.attn.proj.bias", blk["attn"]["out_proj"]["bias"])
        mlp = blk["mlp"]
        if "fc1_g" in mlp:  # SwiGLU
            put(f"{tp}.mlp.fc1_g.weight", np.asarray(mlp["fc1_g"]["kernel"]).T)
            put(f"{tp}.mlp.fc1_g.bias", mlp["fc1_g"]["bias"])
            put(f"{tp}.mlp.fc1_x.weight", np.asarray(mlp["fc1_x"]["kernel"]).T)
            put(f"{tp}.mlp.fc1_x.bias", mlp["fc1_x"]["bias"])
        else:
            put(f"{tp}.mlp.fc1.weight", np.asarray(mlp["fc1"]["kernel"]).T)
            put(f"{tp}.mlp.fc1.bias", mlp["fc1"]["bias"])
        if "norm" in mlp:
            put(f"{tp}.mlp.norm.weight", mlp["norm"]["scale"])
            put(f"{tp}.mlp.norm.bias", mlp["norm"]["bias"])
        put(f"{tp}.mlp.fc2.weight", np.asarray(mlp["fc2"]["kernel"]).T)
        put(f"{tp}.mlp.fc2.bias", mlp["fc2"]["bias"])

    put("norm.weight", visual["ln_post"]["scale"])
    put("norm.bias", visual["ln_post"]["bias"])
    put("head.weight", np.asarray(visual["proj"]["kernel"]).T)
    if "bias" in visual["proj"]:
        put("head.bias", visual["proj"]["bias"])
    return sd
