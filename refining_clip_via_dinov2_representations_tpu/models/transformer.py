"""Flax transformer towers: vision ViT, causal text transformer, CoCa decoder.

TPU-native re-design of the reference towers
(`src/open_clip/transformer.py:219-1356`). Key mappings:

* `ResidualAttentionBlock` → pre-LN block, `x + ls1(attn(ln1(x)))` then
  `x + ls2(mlp(ln2(x)))` (`transformer.py:273-290`).
* `Transformer` → unrolled stack of named blocks `resblocks_{i}` with
  optional per-block `nn.remat` — the JAX equivalent of
  `torch.utils.checkpoint` grad checkpointing (`transformer.py:536-538`).
* `VisionTransformer` → NHWC conv patchify (TPU-native layout; the torch
  OIHW conv kernel is permuted by the checkpoint converter), CLS+pos embed,
  tok/avg/none pooling, optional attentional pooler
  (`transformer.py:551-923`).
* `TextTransformer` → token embed + learned pos embed + causal mask +
  argmax-EOT pooling (`transformer.py:926-1228`).
* `MultimodalTransformer` → CoCa text decoder with interleaved self/cross
  blocks (`transformer.py:1231-1356`).

Images are NHWC everywhere (TPU-native); the public API boundary accepts
NCHW too and transposes once on entry.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    LayerNorm,
    LayerScale,
    MLP,
    MultiheadAttention,
    AttentionalPooler,
    PatchDropout,
    gelu,
)

Dtype = Any


def _resolve_remat_policy(name):
    """Named jax.checkpoint policies for selective rematerialization."""
    if not name or name == "full":
        return None  # save nothing (default remat)
    import jax

    policies = {
        "dots_saveable": jax.checkpoint_policies.dots_saveable,
        "dots_with_no_batch_dims_saveable":
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    }
    if name == "offload_dots_with_no_batch_dims":
        # activations neither kept in HBM nor recomputed: dot outputs stream
        # to pinned host RAM on the forward pass and back on the backward —
        # trades PCIe/DMA bandwidth for recompute FLOPs and HBM
        return jax.checkpoint_policies.offload_dot_with_no_batch_dims(
            "device", "pinned_host"
        )
    return policies[name]


def _remat(block_cls, policy_name, static_argnums=(4,)):
    policy = _resolve_remat_policy(policy_name)
    kwargs = {"static_argnums": static_argnums}
    if policy is not None:
        kwargs["policy"] = policy
    return nn.remat(block_cls, **kwargs)


class ResidualAttentionBlock(nn.Module):
    n_head: int
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    act: Callable[[jnp.ndarray], jnp.ndarray] = gelu
    is_cross_attention: bool = False
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    qkv_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        kv: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        causal: bool = False,
        cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        pos: Optional[jnp.ndarray] = None,
        static_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        compute_kv: bool = False,
    ):
        """`cache`/`pos` switch self-attention into incremental-decode mode
        (see `MultiheadAttention`); returns (x, new_cache) then. Cross
        blocks: `compute_kv=True` returns the head-split (k, v) of `kv`
        (ln_1_kv applied) for reuse across a generation; `static_kv` attends
        over such a precomputed pair instead of reprojecting `kv`."""
        d = x.shape[-1]
        ln = lambda name: LayerNorm(name=name, epsilon=self.norm_eps, dtype=self.dtype)

        kv_n = None
        if self.is_cross_attention and kv is not None:
            kv_n = ln("ln_1_kv")(kv)

        attn = MultiheadAttention(
            num_heads=self.n_head, dtype=self.dtype, attn_impl=self.attn_impl,
            qkv_bias=self.qkv_bias, name="attn"
        )
        if compute_kv:
            assert self.is_cross_attention and kv_n is not None
            return attn(kv_n, kv=kv_n, return_kv=True)
        new_cache = None
        if cache is not None:
            attn_out, new_cache = attn(
                ln("ln_1")(x), kv=kv_n, cache=cache, pos=pos
            )
        elif static_kv is not None:
            attn_out = attn(ln("ln_1")(x), static_kv=static_kv)
        else:
            attn_out = attn(ln("ln_1")(x), kv=kv_n, mask=mask, causal=causal)
        if self.ls_init_value is not None:
            attn_out = LayerScale(self.ls_init_value, name="ls_1", dtype=self.dtype)(attn_out)
        x = x + attn_out

        mlp_out = MLP(
            hidden_dim=int(d * self.mlp_ratio), act=self.act, dtype=self.dtype, name="mlp"
        )(ln("ln_2")(x))
        if self.ls_init_value is not None:
            mlp_out = LayerScale(self.ls_init_value, name="ls_2", dtype=self.dtype)(mlp_out)
        x = x + mlp_out
        if cache is not None:
            return x, new_cache
        return x


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    act: Callable[[jnp.ndarray], jnp.ndarray] = gelu
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    remat_policy: str = "full"
    qkv_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        causal: bool = False,
        caches: Optional[list] = None,
        pos: Optional[jnp.ndarray] = None,
    ):
        """`caches` (one (k,v) pair per layer) + `pos` switch every block
        into incremental decode; returns (x, new_caches) then. Decode has no
        backward, so remat is bypassed in that mode."""
        block_cls = ResidualAttentionBlock
        if self.remat and caches is None:
            block_cls = _remat(ResidualAttentionBlock, self.remat_policy)
        new_caches = [] if caches is not None else None
        for i in range(self.layers):
            blk = block_cls(
                n_head=self.heads,
                mlp_ratio=self.mlp_ratio,
                ls_init_value=self.ls_init_value,
                act=self.act,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                qkv_bias=self.qkv_bias,
                name=f"resblocks_{i}",
            )
            if caches is not None:
                x, c = blk(x, None, None, False, cache=caches[i], pos=pos)
                new_caches.append(c)
            else:
                x = blk(x, None, mask, causal)
        if caches is not None:
            return x, new_caches
        return x


def text_global_pool(
    x: jnp.ndarray,
    text: Optional[jnp.ndarray] = None,
    pool_type: str = "argmax",
) -> jnp.ndarray:
    """Pool token features (`transformer.py:926-942`). 'argmax' picks the EOT
    position — the highest token id in each sequence."""
    if pool_type == "first":
        return x[:, 0]
    if pool_type == "last":
        return x[:, -1]
    if pool_type == "argmax":
        assert text is not None
        eot_idx = jnp.argmax(text, axis=-1)
        return jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
    return x


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False) -> np.ndarray:
    """Fixed 2D sine-cosine positional embedding (`pos_embed.py:20-72`)."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float64)
    grid_w = np.arange(grid_size, dtype=np.float64)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    emb = np.concatenate(
        [_1d(embed_dim // 2, grid[0]), _1d(embed_dim // 2, grid[1])], axis=1
    )
    if cls_token:
        emb = np.concatenate([np.zeros((1, embed_dim)), emb], axis=0)
    return emb.astype(np.float32)


class VisionTransformer(nn.Module):
    image_size: Tuple[int, int] = (224, 224)
    patch_size: Tuple[int, int] = (16, 16)
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    attentional_pool: Any = False  # False | True | 'parallel' | 'cascade'
    attn_pooler_queries: int = 256
    attn_pooler_heads: int = 8
    output_dim: int = 512
    patch_dropout: float = 0.0
    no_ln_pre: bool = False
    pos_embed_type: str = "learnable"
    pool_type: str = "tok"
    final_ln_after_pool: bool = False
    act: Callable[[jnp.ndarray], jnp.ndarray] = gelu
    norm_eps: float = 1e-5
    output_tokens: bool = False
    proj_bias: bool = False        # EVA-style head: Dense projection with bias
    patch_embed_bias: bool = False  # EVA patchify conv carries a bias
    class_token: bool = True       # False: GAP-style trunk (timm vit_*_gap)
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    remat_policy: str = "full"

    @property
    def grid_size(self) -> Tuple[int, int]:
        return (
            self.image_size[0] // self.patch_size[0],
            self.image_size[1] // self.patch_size[1],
        )

    def _embeds(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        b = x.shape[0]
        # NHWC patchify conv, no bias (`transformer.py:587-593`)
        x = nn.Conv(
            features=self.width,
            kernel_size=self.patch_size,
            strides=self.patch_size,
            use_bias=self.patch_embed_bias,
            padding="VALID",
            dtype=self.dtype,
            name="conv1",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.width)

        scale = self.width ** -0.5
        if self.class_token:
            cls_emb = self.param(
                "class_embedding",
                nn.initializers.normal(stddev=scale),
                (self.width,),
                jnp.float32,
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_emb.astype(x.dtype), (b, 1, self.width)), x],
                axis=1,
            )

        n_pos = self.grid_size[0] * self.grid_size[1] + (1 if self.class_token else 0)
        if self.pos_embed_type == "learnable":
            pos = self.param(
                "positional_embedding",
                nn.initializers.normal(stddev=scale),
                (n_pos, self.width),
                jnp.float32,
            )
        elif self.pos_embed_type == "sin_cos_2d":
            # Fixed (non-trainable) embedding: the reference registers it as a
            # parameter with requires_grad=False (`transformer.py:478-487`);
            # the flax equivalent is a traced constant — a param would still
            # receive AdamW weight decay even with zero gradient.
            assert self.grid_size[0] == self.grid_size[1], (
                "sin_cos_2d pos embedding only supports square input"
            )
            pos = jnp.asarray(
                get_2d_sincos_pos_embed(
                    self.width, self.grid_size[0], cls_token=self.class_token
                ),
                dtype=jnp.float32,
            )
            assert pos.shape == (n_pos, self.width)
        else:
            raise ValueError(self.pos_embed_type)
        x = x + pos.astype(x.dtype)

        if self.patch_dropout > 0.0:
            x = PatchDropout(prob=self.patch_dropout, name="patch_dropout")(
                x, deterministic=deterministic
            )
        if not self.no_ln_pre:
            x = LayerNorm(name="ln_pre", epsilon=self.norm_eps, dtype=self.dtype)(x)
        return x

    def _global_pool(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.pool_type == "avg":
            if not self.class_token:
                return jnp.mean(x, axis=1), x
            return jnp.mean(x[:, 1:], axis=1), x[:, 1:]
        if self.pool_type == "tok":
            assert self.class_token, "pool_type 'tok' needs a class token"
            return x[:, 0], x[:, 1:]
        return x, x

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        if x.shape[1] == 3 and x.shape[-1] != 3:
            x = jnp.transpose(x, (0, 2, 3, 1))  # accept NCHW at the boundary
        x = x.astype(self.dtype)
        x = self._embeds(x, deterministic)

        x = Transformer(
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            ls_init_value=self.ls_init_value,
            act=self.act,
            norm_eps=self.norm_eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            remat_policy=self.remat_policy,
            qkv_bias=self.qkv_bias,
            name="transformer",
        )(x)

        ln_post = LayerNorm(name="ln_post", epsilon=self.norm_eps, dtype=self.dtype)
        use_attn_pool = bool(self.attentional_pool)
        if use_attn_pool:
            if isinstance(self.attentional_pool, str):
                # parallel/cascade CoCa-paper pooling (`transformer.py:800-810`)
                x = ln_post(x)
                tokens = AttentionalPooler(
                    d_model=self.output_dim,
                    n_head=self.attn_pooler_heads,
                    n_queries=self.attn_pooler_queries,
                    dtype=self.dtype,
                    name="attn_pool",
                )(x)
                contrastive = AttentionalPooler(
                    d_model=self.output_dim,
                    n_head=self.attn_pooler_heads,
                    n_queries=1,
                    dtype=self.dtype,
                    name="attn_pool_contrastive",
                )(x if self.attentional_pool == "parallel" else tokens)
                pooled = contrastive[:, 0]
            else:
                # original OpenCLIP CoCa pooling (`transformer.py:811-815`)
                x = AttentionalPooler(
                    d_model=self.output_dim,
                    n_head=self.attn_pooler_heads,
                    n_queries=self.attn_pooler_queries,
                    dtype=self.dtype,
                    name="attn_pool",
                )(x)
                x = ln_post(x)
                pooled, tokens = self._global_pool(x)
        elif self.final_ln_after_pool:
            pooled, tokens = self._global_pool(x)
            pooled = ln_post(pooled)
        else:
            x = ln_post(x)
            pooled, tokens = self._global_pool(x)

        if self.proj_bias:
            pooled = nn.Dense(self.output_dim, dtype=self.dtype, name="proj")(pooled)
        else:
            proj = self.param(
                "proj",
                nn.initializers.normal(stddev=self.width ** -0.5),
                (pooled.shape[-1], self.output_dim),
                jnp.float32,
            )
            pooled = pooled @ proj.astype(pooled.dtype)

        if self.output_tokens:
            return pooled, tokens
        return pooled


class TextTransformer(nn.Module):
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    output_dim: Optional[int] = 512
    embed_cls: bool = False
    no_causal_mask: bool = False
    pad_id: int = 0
    pool_type: str = "argmax"
    proj_type: str = "linear"
    proj_bias: bool = False
    act: Callable[[jnp.ndarray], jnp.ndarray] = gelu
    norm_eps: float = 1e-5
    output_tokens: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    remat_policy: str = "full"

    @property
    def num_pos(self) -> int:
        return self.context_length + (1 if self.embed_cls else 0)

    def _cls_mask(self, text: jnp.ndarray) -> jnp.ndarray:
        """Pad mask for the appended CLS token (`transformer.py:1061-1070`).

        Exact reproduction of the reference's `build_cls_mask` F.pad
        semantics, quirks included: only the LAST query row (the CLS
        position) is masked, and the validity columns are shifted by one —
        column 0 is always open and column k gates on token k-1. (Upstream
        open_clip behaviour; required for checkpoint parity.)
        """
        b, l = text.shape
        valid = text != self.pad_id  # [B, L]
        # row for the CLS query: [True, valid[0], ..., valid[L-1]]
        cls_row = jnp.concatenate([jnp.ones((b, 1), bool), valid], axis=1)  # [B, L+1]
        # all other query rows are fully open
        open_rows = jnp.ones((b, l, l + 1), bool)
        mask_bool = jnp.concatenate([open_rows, cls_row[:, None, :]], axis=1)
        add = jnp.where(mask_bool, 0.0, -jnp.inf).astype(jnp.float32)
        return add[:, None, :, :]  # [B, 1, L+1, L+1]

    @nn.compact
    def __call__(
        self,
        text: jnp.ndarray,
        deterministic: bool = True,
        caches: Optional[list] = None,
        pos: Optional[jnp.ndarray] = None,
    ):
        b, seq_len = text.shape
        x = nn.Embed(
            self.vocab_size,
            self.width,
            dtype=self.dtype,
            embedding_init=nn.initializers.normal(stddev=0.02),
            name="token_embedding",
        )(text)

        if caches is not None:
            # Incremental decode (CoCa generation): `text` is the single
            # current token [B, 1]; returns (token output at `pos`, caches).
            # Token outputs never see the appended CLS (it sits at the END,
            # causally invisible to token rows — `_cls_mask` only constrains
            # the CLS query row), so decode is plain cached causal attention.
            pos_emb = self.param(
                "positional_embedding",
                nn.initializers.normal(stddev=0.01),
                (self.num_pos, self.width),
                jnp.float32,
            )
            x = x + jax.lax.dynamic_slice_in_dim(pos_emb, pos, 1, axis=0)[None].astype(x.dtype)
            x, new_caches = Transformer(
                width=self.width, layers=self.layers, heads=self.heads,
                mlp_ratio=self.mlp_ratio, ls_init_value=self.ls_init_value,
                act=self.act, norm_eps=self.norm_eps, dtype=self.dtype,
                attn_impl=self.attn_impl, name="transformer",
            )(x, caches=caches, pos=pos)
            if not self.embed_cls:
                # tokens are post-ln_final in this branch of the full path
                x = LayerNorm(
                    name="ln_final", epsilon=self.norm_eps, dtype=self.dtype
                )(x)
            return x, new_caches

        mask = None
        causal = not self.no_causal_mask
        if self.embed_cls:
            cls_emb = self.param(
                "cls_emb", nn.initializers.normal(stddev=0.01), (self.width,), jnp.float32
            )
            x = jnp.concatenate(
                [x, jnp.broadcast_to(cls_emb.astype(x.dtype), (b, 1, self.width))], axis=1
            )
            seq_len += 1
            cls_mask = self._cls_mask(text)
            if causal:
                causal_add = jnp.triu(
                    jnp.full((seq_len, seq_len), -jnp.inf, dtype=jnp.float32), k=1
                )
                mask = causal_add[None, None] + cls_mask
                causal = False

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.num_pos, self.width),
            jnp.float32,
        )
        x = x + pos[:seq_len].astype(x.dtype)

        x = Transformer(
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            ls_init_value=self.ls_init_value,
            act=self.act,
            norm_eps=self.norm_eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            remat_policy=self.remat_policy,
            name="transformer",
        )(x, mask=mask, causal=causal)

        ln_final = LayerNorm(name="ln_final", epsilon=self.norm_eps, dtype=self.dtype)
        if self.embed_cls:
            # appended CLS overrides pool_type; LN after pooling
            pooled = text_global_pool(x, pool_type="last")
            pooled = ln_final(pooled)
            tokens = x[:, :-1]
        else:
            x = ln_final(x)
            pooled = text_global_pool(x, text, pool_type=self.pool_type)
            tokens = x

        if self.proj_type != "none" and self.output_dim:
            if self.proj_bias:
                pooled = nn.Dense(self.output_dim, dtype=self.dtype, name="text_projection")(
                    pooled
                )
            else:
                proj = self.param(
                    "text_projection",
                    nn.initializers.normal(stddev=self.width ** -0.5),
                    (self.width, self.output_dim),
                    jnp.float32,
                )
                pooled = pooled @ proj.astype(pooled.dtype)

        if self.output_tokens:
            return pooled, tokens
        return pooled


class MultimodalTransformer(nn.Module):
    """CoCa text decoder: causal self-attention + cross-attention to image
    tokens per layer (`transformer.py:1231-1356`)."""

    width: int
    layers: int
    heads: int
    context_length: int = 77
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    output_dim: int = 512
    act: Callable[[jnp.ndarray], jnp.ndarray] = gelu
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    remat_policy: str = "full"

    @nn.compact
    def __call__(
        self,
        image_embs: Optional[jnp.ndarray],
        text_embs: Optional[jnp.ndarray],
        caches: Optional[list] = None,
        pos: Optional[jnp.ndarray] = None,
        cross_caches: Optional[list] = None,
        compute_cross_kv: bool = False,
    ):
        """`caches` (one (k,v) per SELF-attention layer) + `pos` switch into
        incremental decode: `text_embs` is the single current token embedding
        [B, 1, D]; returns (vocab logits [B, 1, V], new_caches). The cross
        keys/values never change across a generation — precompute them ONCE
        with `compute_cross_kv=True` (returns one (k, v) per cross layer)
        and pass the list back as `cross_caches`; without it each decode
        step reprojects `image_embs` in every layer."""
        block_kwargs = dict(
            n_head=self.heads,
            mlp_ratio=self.mlp_ratio,
            ls_init_value=self.ls_init_value,
            act=self.act,
            norm_eps=self.norm_eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
        )
        block_cls = ResidualAttentionBlock
        if self.remat and caches is None and not compute_cross_kv:
            block_cls = _remat(ResidualAttentionBlock, self.remat_policy)
        if compute_cross_kv:
            return [
                block_cls(
                    name=f"cross_attn_{i}", is_cross_attention=True,
                    **block_kwargs,
                )(image_embs, image_embs, compute_kv=True)
                for i in range(self.layers)
            ]
        x = text_embs
        new_caches = [] if caches is not None else None
        for i in range(self.layers):
            self_blk = block_cls(name=f"resblocks_{i}", **block_kwargs)
            if caches is not None:
                x, c = self_blk(x, None, None, False, cache=caches[i], pos=pos)
                new_caches.append(c)
            else:
                x = self_blk(x, None, None, True)
            cross_blk = block_cls(
                name=f"cross_attn_{i}", is_cross_attention=True, **block_kwargs
            )
            if cross_caches is not None:
                x = cross_blk(x, None, static_kv=cross_caches[i])
            else:
                x = cross_blk(x, image_embs, None, False)

        x = LayerNorm(name="ln_final", epsilon=self.norm_eps, dtype=self.dtype)(x)
        proj = self.param(
            "text_projection",
            nn.initializers.normal(stddev=self.width ** -0.5),
            (self.width, self.output_dim),
            jnp.float32,
        )
        out = x @ proj.astype(x.dtype)
        if caches is not None:
            return out, new_caches
        return out
