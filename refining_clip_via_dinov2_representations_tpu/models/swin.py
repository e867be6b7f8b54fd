"""Swin Transformer vision tower (timm `swin_base_patch4_window7_224`).

The reference reaches Swin through `TimmModel`
(`/root/reference/src/open_clip/timm_model.py:23-198`). Native flax
implementation of the original Swin-v1 block (Liu et al., ICCV 2021):
windowed multi-head attention with learned relative position bias,
alternating cyclic-shifted windows with the cross-window attention mask,
patch merging between stages, final LN + global average pool. The trunk
output feeds open_clip's linear projection head (timm_proj='linear').

Numerics are parity-tested against HF `SwinModel` (same original-impl
semantics) in tests/test_swin.py — the same oracle strategy as the SigLIP
and DINOv2 ports. Converters map both the timm checkpoint layout
(`visual.trunk.*`, open_clip hub checkpoints) and the HF layout.

TPU notes: window partitioning is pure reshape/transpose (layout ops XLA
fuses); attention over [nW*B, 49, C] windows dispatches through
ops.attention.multi_head_attention, so the bf16-backward path applies. All
shapes static; shifted masks are computed at trace time with numpy.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import flax.linen as nn

from .transformer import _remat
import jax
import jax.numpy as jnp
import numpy as np

from .layers import LayerNorm, gelu


@dataclasses.dataclass(frozen=True)
class SwinCfg:
    image_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    norm_eps: float = 1e-5

    @property
    def num_features(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)


SWIN_DIMS: Dict[str, SwinCfg] = {
    "swin_base_patch4_window7_224": SwinCfg(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)
    ),
}


def _rel_pos_index(window: int) -> np.ndarray:
    """[Wh*Ww, Wh*Ww] index into the (2W-1)^2 bias table (official impl)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)  # [2, W*W]
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0)  # [N, N, 2]
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)  # [N, N]


def _window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, w*w, C]."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def _window_reverse(x: jnp.ndarray, w: int, h: int, wd: int) -> jnp.ndarray:
    """[B*nW, w*w, C] -> [B, H, W, C]."""
    b = x.shape[0] // ((h // w) * (wd // w))
    x = x.reshape(b, h // w, wd // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, wd, -1)


def _shift_attn_mask(h: int, wd: int, w: int, shift: int) -> np.ndarray:
    """Additive [-inf/0] mask [nW, w*w, w*w] for shifted windows.

    Pure numpy on purpose: this runs at TRACE time (shapes are static), so it
    must stay concrete — routing it through jnp ops would stage it as tracers
    and crash the jitted train step on `np.asarray` (caught by the r5
    abstract-init sweep over all registry configs)."""
    img = np.zeros((1, h, wd, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    # numpy clone of _window_partition: [1, H, W, 1] -> [nW, w*w]
    win = (
        img.reshape(1, h // w, w, wd // w, w, 1)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(-1, w * w)
    )
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        # x: [nWB, N, C]; mask: [nW, N, N] additive or None
        nwb, n, c = x.shape
        head_dim = c // self.heads
        qkv_k = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (c, 3 * c), jnp.float32
        )
        if self.qkv_bias:
            qkv_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,), jnp.float32)
        else:
            qkv_b = jnp.zeros((3 * c,), jnp.float32)
        qkv = x @ qkv_k.astype(self.dtype) + qkv_b.astype(self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(nwb, n, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, self.heads),
            jnp.float32,
        )
        idx = _rel_pos_index(self.window).reshape(-1)
        bias = table[idx].reshape(n, n, self.heads).transpose(2, 0, 1)  # [H, N, N]
        add = bias[None]  # [1, H, N, N] broadcastable over windows*batch

        from ..ops.attention import multi_head_attention

        if mask is not None:
            nw = mask.shape[0]
            m = jnp.asarray(mask, jnp.float32)  # [nW, N, N]
            m = jnp.tile(m, (nwb // nw, 1, 1))[:, None]  # [nwb, 1, N, N]
            add = add + m
        out = multi_head_attention(q, k, v, mask=add, impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(nwb, n, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    input_hw: Tuple[int, int]
    window: int
    shift: int
    mlp_ratio: float
    qkv_bias: bool
    norm_eps: float
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, wd = self.input_hw
        b, l, c = x.shape
        shortcut = x
        x = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="ln_1")(x)
        x = x.reshape(b, h, wd, c)
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(h, wd, self.window, self.shift))
        else:
            mask = None
        xw = _window_partition(x, self.window)
        xw = WindowAttention(
            self.dim, self.heads, self.window, self.qkv_bias,
            dtype=self.dtype, attn_impl=self.attn_impl, name="attn",
        )(xw, mask)
        x = _window_reverse(xw, self.window, h, wd)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x.reshape(b, l, c)

        y = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = gelu(y)
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    input_hw: Tuple[int, int]
    norm_eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, wd = self.input_hw
        b, l, c = x.shape
        x = x.reshape(b, h, wd, c)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(b, l // 4, 4 * c)
        x = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinVisionTower(nn.Module):
    """Swin trunk + pooled projection (`timm_model.py` pool ''/avg + linear
    proj semantics: trunk pools with global avg, head Linear -> embed)."""

    cfg: SwinCfg
    output_dim: int
    proj_bias: bool = False
    output_tokens: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        c = self.cfg
        x = x.astype(self.dtype)
        # window divisibility: this implementation does not pad feature maps
        # to window multiples (the 224/patch4/window7 registry config never
        # needs it); fail clearly instead of with a reshape error.
        g0 = c.image_size // c.patch_size
        g = g0
        for _ in range(len(c.depths)):
            if min(g, c.window_size) < g and g % c.window_size != 0:
                raise ValueError(
                    f"Swin image_size {c.image_size}: stage grid {g} is not "
                    f"divisible by window {c.window_size}; use a size whose "
                    "stage grids divide the window (e.g. 224 for window 7)"
                )
            g //= 2
        x = nn.Conv(
            c.embed_dim, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, c.embed_dim)
        x = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="patch_norm")(x)

        hw = (gh, gw)
        dim = c.embed_dim
        block_cls = (
            _remat(SwinBlock, self.remat_policy, static_argnums=())
            if self.remat else SwinBlock
        )
        for si, (depth, heads) in enumerate(zip(c.depths, c.num_heads)):
            # official clamp: window >= feature map -> full-window attention
            # with no shift (last stage of 224/patch4/window7 is 7x7)
            win = min(c.window_size, min(hw))
            no_shift = min(hw) <= c.window_size
            for bi in range(depth):
                shift = 0 if (bi % 2 == 0 or no_shift) else win // 2
                x = block_cls(
                    dim=dim, heads=heads, input_hw=hw, window=win,
                    shift=shift, mlp_ratio=c.mlp_ratio, qkv_bias=c.qkv_bias,
                    norm_eps=c.norm_eps, dtype=self.dtype,
                    attn_impl=self.attn_impl,
                    name=f"stage_{si}_block_{bi}",
                )(x)
            if si < len(c.depths) - 1:
                x = PatchMerging(
                    dim=dim, input_hw=hw, norm_eps=c.norm_eps, dtype=self.dtype,
                    name=f"stage_{si}_downsample",
                )(x)
                hw = (hw[0] // 2, hw[1] // 2)
                dim *= 2

        x = LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="norm")(x)
        pooled = jnp.mean(x, axis=1)
        tokens = x
        pooled = nn.Dense(
            self.output_dim, use_bias=self.proj_bias, dtype=self.dtype, name="proj"
        )(pooled)
        if self.output_tokens:
            return pooled, tokens
        return pooled


# ---------------------------------------------------------------------------
# Converters
# ---------------------------------------------------------------------------

def _t(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, np.float32)


def convert_hf_swin_state_dict(state_dict: Mapping[str, Any], cfg: SwinCfg) -> Dict[str, Any]:
    """HF SwinModel state dict -> this tower's params (oracle converter)."""
    p: Dict[str, Any] = {}
    qkv: Dict[str, Dict[str, np.ndarray]] = {}

    def setp(path, val):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = val

    for key, val in state_dict.items():
        k = key.replace("swin.", "")
        parts = k.split(".")
        if k == "embeddings.patch_embeddings.projection.weight":
            setp(["patch_embed", "kernel"], _t(val).transpose(2, 3, 1, 0))
        elif k == "embeddings.patch_embeddings.projection.bias":
            setp(["patch_embed", "bias"], _t(val))
        elif k.startswith("embeddings.norm."):
            setp(["patch_norm", "scale" if parts[-1] == "weight" else "bias"], _t(val))
        elif k == "layernorm.weight":
            setp(["norm", "scale"], _t(val))
        elif k == "layernorm.bias":
            setp(["norm", "bias"], _t(val))
        elif parts[0] == "encoder" and parts[1] == "layers":
            si = int(parts[2])
            if parts[3] == "blocks":
                bi = int(parts[4])
                blk = f"stage_{si}_block_{bi}"
                rest = parts[5:]
                if rest[0] == "layernorm_before":
                    setp([blk, "ln_1", "scale" if rest[1] == "weight" else "bias"], _t(val))
                elif rest[0] == "layernorm_after":
                    setp([blk, "ln_2", "scale" if rest[1] == "weight" else "bias"], _t(val))
                elif rest[0] == "attention":
                    if rest[1] == "self" and rest[2] in ("query", "key", "value"):
                        qkv.setdefault(blk, {})[f"{rest[2]}.{rest[3]}"] = _t(val)
                    elif rest[1] == "self" and rest[2] == "relative_position_bias_table":
                        setp([blk, "attn", "relative_position_bias_table"], _t(val))
                    elif rest[1] == "self" and rest[2] == "relative_position_index":
                        pass  # recomputed
                    elif rest[1] == "output" and rest[2] == "dense":
                        leaf = "kernel" if rest[3] == "weight" else "bias"
                        setp([blk, "attn", "out_proj", leaf],
                             _t(val).T if rest[3] == "weight" else _t(val))
                    else:
                        raise KeyError(key)
                elif rest[0] == "intermediate":
                    leaf = "kernel" if rest[2] == "weight" else "bias"
                    setp([blk, "fc1", leaf], _t(val).T if rest[2] == "weight" else _t(val))
                elif rest[0] == "output":
                    leaf = "kernel" if rest[2] == "weight" else "bias"
                    setp([blk, "fc2", leaf], _t(val).T if rest[2] == "weight" else _t(val))
                else:
                    raise KeyError(key)
            elif parts[3] == "downsample":
                ds = f"stage_{si}_downsample"
                if parts[4] == "reduction":
                    setp([ds, "reduction", "kernel"], _t(val).T)
                elif parts[4] == "norm":
                    setp([ds, "norm", "scale" if parts[5] == "weight" else "bias"], _t(val))
                else:
                    raise KeyError(key)
            else:
                raise KeyError(key)
        elif parts[0] == "pooler":
            pass  # HF adds a pooler head we don't use
        else:
            raise KeyError(key)

    for blk, d in qkv.items():
        kernel = np.concatenate(
            [d["query.weight"].T, d["key.weight"].T, d["value.weight"].T], axis=1
        )
        bias = np.concatenate([d["query.bias"], d["key.bias"], d["value.bias"]])
        node = p.setdefault(blk, {}).setdefault("attn", {})
        node["in_proj_kernel"] = kernel
        node["in_proj_bias"] = bias
    return p


def convert_timm_swin_state_dict(
    state_dict: Mapping[str, Any], cfg: Optional[SwinCfg] = None,
    prefix: str = "visual.trunk.",
) -> Dict[str, Any]:
    """timm swin layout (open_clip hub checkpoints, `visual.trunk.*`)."""
    p: Dict[str, Any] = {}

    def setp(path, val):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = val

    for key, val in state_dict.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        parts = k.split(".")
        if k == "patch_embed.proj.weight":
            setp(["patch_embed", "kernel"], _t(val).transpose(2, 3, 1, 0))
        elif k == "patch_embed.proj.bias":
            setp(["patch_embed", "bias"], _t(val))
        elif k.startswith("patch_embed.norm."):
            setp(["patch_norm", "scale" if parts[-1] == "weight" else "bias"], _t(val))
        elif parts[0] == "layers":
            si = int(parts[1])
            if parts[2] == "blocks":
                bi = int(parts[3])
                blk = f"stage_{si}_block_{bi}"
                rest = parts[4:]
                if rest[0] in ("norm1", "norm2"):
                    name = "ln_1" if rest[0] == "norm1" else "ln_2"
                    setp([blk, name, "scale" if rest[1] == "weight" else "bias"], _t(val))
                elif rest[0] == "attn":
                    if rest[1] == "qkv":
                        if rest[2] == "weight":
                            setp([blk, "attn", "in_proj_kernel"], _t(val).T)
                        else:
                            setp([blk, "attn", "in_proj_bias"], _t(val))
                    elif rest[1] == "proj":
                        leaf = "kernel" if rest[2] == "weight" else "bias"
                        setp([blk, "attn", "out_proj", leaf],
                             _t(val).T if rest[2] == "weight" else _t(val))
                    elif rest[1] == "relative_position_bias_table":
                        setp([blk, "attn", "relative_position_bias_table"], _t(val))
                    elif rest[1] == "relative_position_index":
                        pass
                    else:
                        raise KeyError(key)
                elif rest[0] == "mlp":
                    leaf = "kernel" if rest[2] == "weight" else "bias"
                    setp([blk, rest[1], leaf], _t(val).T if rest[2] == "weight" else _t(val))
                else:
                    raise KeyError(key)
            elif parts[2] == "downsample":
                ds = f"stage_{si}_downsample"
                if parts[3] == "reduction":
                    setp([ds, "reduction", "kernel"], _t(val).T)
                elif parts[3] == "norm":
                    setp([ds, "norm", "scale" if parts[4] == "weight" else "bias"], _t(val))
                else:
                    raise KeyError(key)
            else:
                raise KeyError(key)
        elif parts[0] == "norm":
            setp(["norm", "scale" if parts[1] == "weight" else "bias"], _t(val))
        elif parts[0] == "head":
            leaf = "kernel" if parts[1] == "weight" else "bias"
            setp(["proj", leaf], _t(val).T if parts[1] == "weight" else _t(val))
        else:
            raise KeyError(key)
    return p


def swin_params_to_timm_state_dict(
    visual: Mapping[str, Any], prefix: str = "visual.trunk."
) -> Dict[str, Any]:
    """Inverse of `convert_timm_swin_state_dict`: flax Swin tower params →
    timm swin layout. (`relative_position_index` is a derived buffer and is
    not emitted; timm recomputes it.)"""
    sd: Dict[str, Any] = {}

    def put(key, val):
        sd[prefix + key] = np.asarray(val, np.float32)

    for name in visual:
        p = visual[name]
        if name == "patch_embed":
            put("patch_embed.proj.weight",
                np.transpose(np.asarray(p["kernel"], np.float32), (3, 2, 0, 1)))
            put("patch_embed.proj.bias", p["bias"])
        elif name == "patch_norm":
            put("patch_embed.norm.weight", p["scale"])
            put("patch_embed.norm.bias", p["bias"])
        elif "_block_" in name:
            si, bi = name[len("stage_"):].split("_block_")
            bp = f"layers.{si}.blocks.{bi}"
            put(f"{bp}.norm1.weight", p["ln_1"]["scale"])
            put(f"{bp}.norm1.bias", p["ln_1"]["bias"])
            put(f"{bp}.norm2.weight", p["ln_2"]["scale"])
            put(f"{bp}.norm2.bias", p["ln_2"]["bias"])
            put(f"{bp}.attn.qkv.weight", np.asarray(p["attn"]["in_proj_kernel"]).T)
            put(f"{bp}.attn.qkv.bias", p["attn"]["in_proj_bias"])
            put(f"{bp}.attn.proj.weight", np.asarray(p["attn"]["out_proj"]["kernel"]).T)
            put(f"{bp}.attn.proj.bias", p["attn"]["out_proj"]["bias"])
            put(f"{bp}.attn.relative_position_bias_table",
                p["attn"]["relative_position_bias_table"])
            for fc in ("fc1", "fc2"):
                put(f"{bp}.mlp.{fc}.weight", np.asarray(p[fc]["kernel"]).T)
                put(f"{bp}.mlp.{fc}.bias", p[fc]["bias"])
        elif name.endswith("_downsample"):
            si = name[len("stage_"):-len("_downsample")]
            put(f"layers.{si}.downsample.reduction.weight",
                np.asarray(p["reduction"]["kernel"]).T)
            put(f"layers.{si}.downsample.norm.weight", p["norm"]["scale"])
            put(f"layers.{si}.downsample.norm.bias", p["norm"]["bias"])
        elif name == "norm":
            put("norm.weight", p["scale"])
            put("norm.bias", p["bias"])
        elif name == "proj":
            put("head.weight", np.asarray(p["kernel"]).T)
            if "bias" in p:
                put("head.bias", p["bias"])
        else:
            raise KeyError(f"unexported swin tower entry {name}")
    return sd
