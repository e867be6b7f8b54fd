"""evaluate() gating + encode-fn compile caching (reference train.py:588-760)."""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.models import (
    build_model,
    parse_model_cfg,
)
from refining_clip_via_dinov2_representations_tpu.train.evaluate import (
    _encode_fn,
    evaluate,
)

TINY_CFG = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 16, "patch_size": 8, "width": 32, "layers": 2, "head_width": 16},
    "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 4, "layers": 2},
}


def _model_and_vars():
    model = build_model(parse_model_cfg(TINY_CFG))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 12), jnp.int32)
    )
    return model, variables


class _ExplodingLoader:
    """A loader that fails the test if evaluate() iterates it."""

    num_samples = 8

    def __iter__(self):
        raise AssertionError("evaluate() should have been gated off")


def _args(val_frequency, epochs=6):
    return types.SimpleNamespace(
        val_frequency=val_frequency, epochs=epochs, imagenet_val=None,
        imagenet_v2=None, zeroshot_frequency=0,
    )


def _data_exploding():
    return {"val": types.SimpleNamespace(dataloader=_ExplodingLoader())}


def test_val_frequency_zero_skips_entirely():
    model, variables = _model_and_vars()
    m = evaluate(model, variables, _data_exploding(), epoch=2, args=_args(0))
    assert "clip_val_loss" not in m


def test_val_frequency_modulo_gate():
    model, variables = _model_and_vars()
    # epoch 1 with frequency 2: skipped (not final epoch either)
    m = evaluate(model, variables, _data_exploding(), epoch=1, args=_args(2))
    assert "clip_val_loss" not in m
    # final epoch always runs regardless of modulo
    with pytest.raises(AssertionError, match="gated off"):
        evaluate(model, variables, _data_exploding(), epoch=5, args=_args(2, epochs=5))


def test_encode_fn_cached_across_calls():
    model, variables = _model_and_vars()
    f1 = _encode_fn(model)
    f2 = _encode_fn(model)
    assert f1 is f2, "encode fn must be cached per model (no per-eval recompile)"
    img, txt = jnp.zeros((2, 16, 16, 3)), jnp.zeros((2, 12), jnp.int32)
    i, t, s, g = f1(variables, img, txt)
    assert np.asarray(i).shape == (2, 32)
