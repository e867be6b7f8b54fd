"""Fused VMEM-resident attention vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.ops.attention import (
    dot_product_attention_xla,
    multi_head_attention,
)
from refining_clip_via_dinov2_representations_tpu.ops.fused_attention import (
    fused_attention,
    fused_attention_compatible,
)


def _qkv(b=2, h=3, lq=23, lk=23, d=16, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda l: jnp.asarray(rng.normal(size=(b, h, l, d)), dtype)
    return mk(lq), mk(lk), mk(lk)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("l", [23, 77, 197])
def test_fused_forward_matches_xla(causal, l):
    q, k, v = _qkv(lq=l, lk=l)
    scale = q.shape[-1] ** -0.5
    got = fused_attention(q, k, v, scale, causal)
    mask = None
    if causal:
        mask = jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)
    want = dot_product_attention_xla(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_gradients_match_xla(causal):
    q, k, v = _qkv(lq=33, lk=33)
    scale = q.shape[-1] ** -0.5
    l = q.shape[2]
    mask = (
        jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1) if causal else None
    )

    def loss_fused(q, k, v):
        o = fused_attention(q, k, v, scale, causal)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    def loss_xla(q, k, v):
        o = dot_product_attention_xla(q, k, v, mask=mask)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fused, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-5, err_msg=name
        )


def test_compatibility_gate():
    q, k, v = _qkv(lq=197, lk=197)
    assert fused_attention_compatible(q, k, v, None)
    assert not fused_attention_compatible(q, k, v, jnp.zeros((197, 197)))
    ql, kl, vl = _qkv(b=1, h=1, lq=2048, lk=2048, d=16)
    assert not fused_attention_compatible(ql, kl, vl, None)


def test_dispatcher_fused_path_off_tpu_falls_to_xla():
    """multi_head_attention(impl='fused') is numerically the XLA result."""
    q, k, v = _qkv(lq=50, lk=50)
    got = multi_head_attention(q, k, v, impl="fused")
    want = multi_head_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_bf16_bwd_attention_matches_autodiff():
    """dot_product_attention_bf16_bwd: same forward, matching gradients."""
    from refining_clip_via_dinov2_representations_tpu.ops.attention import (
        dot_product_attention_bf16_bwd,
    )

    q, k, v = _qkv(lq=41, lk=41)
    l = q.shape[2]
    mask = jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)

    for m in (None, mask):
        got = dot_product_attention_bf16_bwd(q, k, v, mask=m)
        want = dot_product_attention_xla(q, k, v, mask=m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

        def loss_c(q, k, v, m=m):
            return jnp.sum(jnp.tanh(dot_product_attention_bf16_bwd(q, k, v, mask=m)))

        def loss_a(q, k, v, m=m):
            return jnp.sum(jnp.tanh(dot_product_attention_xla(q, k, v, mask=m)))

        gc = jax.grad(loss_c, argnums=(0, 1, 2))(q, k, v)
        ga = jax.grad(loss_a, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gc, ga, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5, rtol=3e-5, err_msg=name)


def test_bf16_bwd_attention_mask_gradient():
    """Learned additive masks (Swin/relpos bias tables) must receive the
    same gradient as through autodiff — regression for a zero-cotangent bug."""
    from refining_clip_via_dinov2_representations_tpu.ops.attention import (
        dot_product_attention_bf16_bwd,
    )

    q, k, v = _qkv(b=2, h=3, lq=9, lk=9)
    rng = np.random.default_rng(7)
    for shape in ((9, 9), (1, 3, 9, 9), (2, 1, 9, 9)):
        mask = jnp.asarray(rng.normal(size=shape), jnp.float32)

        gc = jax.grad(
            lambda m: jnp.sum(jnp.tanh(dot_product_attention_bf16_bwd(q, k, v, mask=m)))
        )(mask)
        ga = jax.grad(
            lambda m: jnp.sum(jnp.tanh(dot_product_attention_xla(q, k, v, mask=m)))
        )(mask)
        assert float(jnp.abs(ga).sum()) > 0, "oracle grad must be nonzero"
        np.testing.assert_allclose(
            np.asarray(gc), np.asarray(ga), atol=3e-5, rtol=3e-5,
            err_msg=str(shape),
        )
