"""Relative-position-bias ViT (timm `vit_relpos_medium_patch16_cls_224`).

BEiT-style learned relative position bias replacing the absolute positional
embedding: per-block bias tables of size ((2H-1)(2W-1) + 3, heads) — the +3
entries cover cls->token, token->cls, cls->cls (timm RelPosBias with one
prefix token). No absolute pos embed; class-token pooling; pre-norm blocks.

No timm oracle exists in this environment; the grid/cls index construction
follows the published BEiT scheme and is fixture-tested
(tests/test_factory.py); flagged for value verification on first real
checkpoint load, like the EVA family. Uncertain-by-necessity timm default
mirrored here: qkv_bias=False for the relpos model family.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import flax.linen as nn

from .transformer import _remat
import jax.numpy as jnp
import numpy as np

from .layers import MLP, LayerNorm, MultiheadAttention, gelu


def build_relpos_index(grid: Tuple[int, int], prefix_tokens: int = 1) -> np.ndarray:
    """[N+p, N+p] indices into the bias table (BEiT scheme)."""
    h, w = grid
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    idx = rel.sum(-1)  # [N, N] in [0, (2h-1)(2w-1))
    if prefix_tokens:
        num = (2 * h - 1) * (2 * w - 1)
        n = idx.shape[0]
        full = np.zeros((n + 1, n + 1), np.int64)
        full[1:, 1:] = idx
        full[0, 1:] = num      # cls -> token
        full[1:, 0] = num + 1  # token -> cls
        full[0, 0] = num + 2   # cls -> cls
        return full
    return idx


class RelPosBlock(nn.Module):
    heads: int
    grid: Tuple[int, int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    norm_eps: float = 1e-6
    act: Callable = gelu
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        n_entries = (2 * self.grid[0] - 1) * (2 * self.grid[1] - 1) + 3
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            (n_entries, self.heads),
            jnp.float32,
        )
        idx = build_relpos_index(self.grid, prefix_tokens=1).reshape(-1)
        n = x.shape[1]
        bias = table[idx].reshape(n, n, self.heads).transpose(2, 0, 1)[None]

        y = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="ln_1")(x)
        y = MultiheadAttention(
            num_heads=self.heads, dtype=self.dtype, attn_impl=self.attn_impl,
            qkv_bias=self.qkv_bias, name="attn",
        )(y, mask=bias)
        x = x + y
        z = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="ln_2")(x)
        z = MLP(hidden_dim=int(d * self.mlp_ratio), act=self.act,
                dtype=self.dtype, name="mlp")(z)
        return x + z


class RelPosVisionTower(nn.Module):
    width: int
    layers: int
    heads: int
    patch_size: int
    image_size: int
    output_dim: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    norm_eps: float = 1e-6
    output_tokens: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        grid = (self.image_size // self.patch_size,) * 2
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.width, (self.patch_size,) * 2, strides=(self.patch_size,) * 2,
            padding="VALID", use_bias=True, dtype=self.dtype, name="conv1",
        )(x)
        b = x.shape[0]
        x = x.reshape(b, grid[0] * grid[1], self.width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(1e-6), (self.width,), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.width)), x], axis=1
        )
        block_cls = (
            _remat(RelPosBlock, self.remat_policy, static_argnums=())
            if self.remat else RelPosBlock
        )
        for i in range(self.layers):
            x = block_cls(
                heads=self.heads, grid=grid, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, norm_eps=self.norm_eps,
                dtype=self.dtype, attn_impl=self.attn_impl,
                name=f"resblocks_{i}",
            )(x)
        x = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="ln_post")(x)
        pooled, tokens = x[:, 0], x[:, 1:]
        pooled = nn.Dense(
            self.output_dim, use_bias=False, dtype=self.dtype, name="proj"
        )(pooled)
        if self.output_tokens:
            return pooled, tokens
        return pooled
