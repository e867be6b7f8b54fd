"""Core flax layers for the CLIP towers.

TPU-native re-implementations of the reference's torch building blocks
(`src/open_clip/transformer.py:14-216`). Numerical contracts preserved:

* LayerNorm statistics are always computed in float32 and cast back to the
  input dtype — this covers both reference variants (`LayerNorm` /
  `LayerNormFp32`, `transformer.py:14-31`) since bf16 params + fp32 math is
  the TPU-native precision policy.
* QuickGELU is `x * sigmoid(1.702 x)` exactly (`transformer.py:34-37`) —
  required for OpenAI-weight fidelity.
* Attention projections use the fused-QKV layout so converted torch
  `in_proj_weight` tensors land without splitting.

All modules take `dtype` (compute dtype, default fp32) and keep parameters in
`param_dtype` (fp32 by default) — mixed precision the JAX way instead of
autocast/GradScaler.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention

Dtype = Any


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # torch nn.GELU default is the exact (erf) form — kept bit-faithful for
    # fp32 (the parity/oracle path). Under bf16 compute the tanh form is
    # used: its max error vs erf (4.7e-4 absolute) sits below bf16 rounding
    # noise — measured ViT-B/32 embedding cosine vs fp32 is IDENTICAL
    # (erf16 0.9999375, tanh16 0.9999380) — while the erf polynomial costs
    # ~0.34 ms per c_fc epilogue on the v5e VPU (the single largest
    # non-matmul cost in the train step).
    return jax.nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


def get_act_fn(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name == "quick_gelu":
        return quick_gelu
    if name == "gelu":
        return gelu
    if name == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu
    if name == "silu":
        return jax.nn.silu
    raise ValueError(f"unknown activation {name!r}")


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics, cast back to input dtype."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        dim = x.shape[-1]
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
            y = y + bias
        return y.astype(orig_dtype)


class LayerScale(nn.Module):
    """Per-channel learnable residual scaling (`transformer.py:40-47`)."""

    init_values: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_values), (dim,), jnp.float32
        )
        return x * gamma.astype(x.dtype)


class PatchDropout(nn.Module):
    """Token subsampling during training (`transformer.py:50-87`).

    Keeps a uniformly random subset of `1-prob` patch tokens (CLS excluded by
    default). Identity when not training or prob == 0.
    """

    prob: float = 0.5
    exclude_first_token: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.prob == 0.0:
            return x
        if self.exclude_first_token:
            cls_tok, x_rest = x[:, :1], x[:, 1:]
        else:
            cls_tok, x_rest = x[:, :0], x

        b, n, _ = x_rest.shape
        num_keep = max(1, int(n * (1.0 - self.prob)))
        rng = self.make_rng("patch_dropout")
        # random subset without replacement per example: rank random scores
        scores = jax.random.uniform(rng, (b, n))
        keep_idx = jnp.argsort(scores, axis=-1)[:, :num_keep]
        x_rest = jnp.take_along_axis(x_rest, keep_idx[:, :, None], axis=1)
        return jnp.concatenate([cls_tok, x_rest], axis=1)


class MultiheadAttention(nn.Module):
    """Fused-QKV multi-head self/cross attention.

    Parameter layout: `in_proj_kernel` is `(dim, 3*dim)` — the transpose of
    torch's `in_proj_weight` — so converted checkpoints do a single `T`.
    Cross attention (CoCa decoder, `transformer.py:260-271`) routes the query
    through the Q third of the fused kernel and keys/values through the K/V
    thirds, matching torch MultiheadAttention with equal embed dims.
    Output proj is a standard Dense named `out_proj`.
    """

    num_heads: int
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
        return_kv: bool = False,
    ):
        """Full mode (cache=None): returns [B, L, D].

        Incremental-decode mode (cache=(k,v) each [B, H, L, Dh], pos=current
        position): x is the single current token [B, 1, D]; its K/V are
        written into the cache at `pos` and attention runs over positions
        <= pos. Returns (out [B, 1, D], new_cache). Numerics go through the
        same `multi_head_attention` dispatch as the full path.

        Cross-attention decode: `return_kv=True` computes and returns the
        head-split (k, v) of `kv` (no attention — the precompute step);
        `static_kv=(k, v)` attends the query tokens over those fixed heads
        without recomputing the projections (they never change across a
        generation). Returns [B, Lq, D].
        """
        b, lq, d = x.shape
        assert d % self.num_heads == 0
        head_dim = d // self.num_heads
        kv = x if kv is None else kv
        lk = kv.shape[1]

        kernel = self.param(
            "in_proj_kernel",
            nn.initializers.normal(stddev=d ** -0.5),
            (d, 3 * d),
            jnp.float32,
        ).astype(self.dtype)
        if self.qkv_bias:
            bias = self.param(
                "in_proj_bias", nn.initializers.zeros, (3 * d,), jnp.float32
            ).astype(self.dtype)
        else:
            bias = jnp.zeros((3 * d,), self.dtype)

        # three slice-matmuls, NOT one fused [D,3D] matmul: XLA fuses each
        # slice's output epilogue directly into the per-head transpose, so
        # the split costs nothing. Measured (v5e, ViT-B/16 bs96 step): the
        # single fused matmul runs faster alone (159 vs 150 TFLOPS) but
        # forces ~6 ms of standalone split/transpose copies — net +4.7 ms
        # per step. Keep the slices.
        def heads_of(t):
            return t.reshape(
                t.shape[0], t.shape[1], self.num_heads, head_dim
            ).transpose(0, 2, 1, 3)

        if return_kv:
            k = kv @ kernel[:, d : 2 * d] + bias[d : 2 * d]
            v = kv @ kernel[:, 2 * d :] + bias[2 * d :]
            return heads_of(k), heads_of(v)

        q = x @ kernel[:, :d] + bias[:d]
        if static_kv is not None:
            out = multi_head_attention(
                heads_of(q), static_kv[0], static_kv[1], mask=mask, impl="xla"
            )
            out = out.transpose(0, 2, 1, 3).reshape(b, lq, d)
            return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)

        k = kv @ kernel[:, d : 2 * d] + bias[d : 2 * d]
        v = kv @ kernel[:, 2 * d :] + bias[2 * d :]

        # Layout study (measured, v5e ViT-B/16 bs96 step): a BLHD-native
        # variant — q/k/v kept [B,L,H,D], head split folded into the
        # attention einsums ("bqhd,bkhd->bhqk"), custom bf16 backward in the
        # same layout — compiled and ran at 109.07 ms/step vs 109.2 ms for
        # this BHLD path: identical within noise. XLA already folds these
        # transposes into the surrounding matmuls; the HLO "copy"
        # instructions around them are the scheduled form of the same work,
        # not removable overhead. Keep the conventional layout.
        def heads(t, l):
            return t.reshape(b, l, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        if cache is not None:
            assert lq == 1 and pos is not None, "decode mode takes one token"
            ck, cv = cache  # [B, H, L, Dh]
            ck = jax.lax.dynamic_update_slice(ck, heads(k, 1), (0, 0, pos, 0))
            cv = jax.lax.dynamic_update_slice(cv, heads(v, 1), (0, 0, pos, 0))
            # additive key mask: only positions <= pos are live
            key_mask = jnp.where(
                jnp.arange(ck.shape[2])[None, None, None, :] <= pos, 0.0, -jnp.inf
            ).astype(jnp.float32)
            out = multi_head_attention(
                heads(q, 1), ck, cv, mask=key_mask, impl="xla"
            )
            out = out.transpose(0, 2, 1, 3).reshape(b, 1, d)
            return nn.Dense(d, dtype=self.dtype, name="out_proj")(out), (ck, cv)

        out = multi_head_attention(
            heads(q, lq), heads(k, lk), heads(v, lk),
            mask=mask, causal=causal, impl=self.attn_impl,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class MLP(nn.Module):
    """Transformer MLP: c_fc -> act -> c_proj (`transformer.py:245-253`)."""

    hidden_dim: int
    act: Callable[[jnp.ndarray], jnp.ndarray] = gelu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="c_fc")(x)
        h = self.act(h)
        return nn.Dense(d, dtype=self.dtype, name="c_proj")(h)


class AttentionalPooler(nn.Module):
    """Learned-query cross-attention pooler (`transformer.py:194-216`).

    Torch's kdim/vdim MultiheadAttention uses *separate* q/k/v projection
    matrices; mirrored here as three Dense layers (q_proj/k_proj/v_proj).
    """

    d_model: int
    n_head: int = 8
    n_queries: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        query = self.param(
            "query",
            nn.initializers.normal(stddev=1.0),
            (self.n_queries, self.d_model),
            jnp.float32,
        )
        x = LayerNorm(name="ln_k", dtype=self.dtype)(x)
        q = LayerNorm(name="ln_q", dtype=self.dtype)(
            jnp.broadcast_to(query, (b, self.n_queries, self.d_model)).astype(self.dtype)
        )

        head_dim = self.d_model // self.n_head
        qp = nn.Dense(self.d_model, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(self.d_model, dtype=self.dtype, name="k_proj")(x)
        vp = nn.Dense(self.d_model, dtype=self.dtype, name="v_proj")(x)

        def heads(t, l):
            return t.reshape(b, l, self.n_head, head_dim).transpose(0, 2, 1, 3)

        out = multi_head_attention(
            heads(qp, self.n_queries), heads(kp, x.shape[1]), heads(vp, x.shape[1])
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, self.n_queries, self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(out)
