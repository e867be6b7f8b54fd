"""Flash-attention kernel correctness vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.ops.attention import (
    dot_product_attention_xla,
)
from refining_clip_via_dinov2_representations_tpu.ops.flash_attention import (
    flash_mha,
)


def _qkv(b=2, h=4, l=197, d=64, seed=0):
    rng = np.random.default_rng(seed)
    shape = (b, h, l, d)
    return tuple(jnp.asarray(rng.normal(size=shape), jnp.float32) for _ in range(3))


# the odd sequence lengths of this framework's towers (SURVEY §7 hard part 5)
@pytest.mark.parametrize("l", [50, 77, 197, 257])
def test_flash_matches_xla(l):
    q, k, v = _qkv(l=l)
    want = dot_product_attention_xla(q, k, v)
    got = flash_mha(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_flash_causal_matches_xla():
    q, k, v = _qkv(l=77)
    mask = jnp.triu(jnp.full((77, 77), -jnp.inf, jnp.float32), k=1)
    want = dot_product_attention_xla(q, k, v, mask=mask)
    got = flash_mha(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_flash_gradients_match_xla():
    q, k, v = _qkv(l=64)

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, causal=True) ** 2)

    def loss_xla(q, k, v):
        mask = jnp.triu(jnp.full((64, 64), -jnp.inf, jnp.float32), k=1)
        return jnp.sum(dot_product_attention_xla(q, k, v, mask=mask) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_flash_bf16():
    q, k, v = [t.astype(jnp.bfloat16) for t in _qkv(l=128)]
    want = dot_product_attention_xla(q, k, v)
    got = flash_mha(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )
