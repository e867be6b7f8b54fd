"""External converter tests: big_vision text mapping loads into our tower."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.models.convert_external import (
    convert_mobileclip_text_state_dict,
    load_big_vision_text_params,
)
from refining_clip_via_dinov2_representations_tpu.models.transformer import (
    TextTransformer,
)


def _fake_big_vision_npz(d=32, heads=4, layers=2, vocab=64, ctx=12, out_dim=16):
    rng = np.random.default_rng(0)
    dh = d // heads
    w = {}
    p = "params/txt/"
    w[p + "Embed_0/embedding"] = rng.normal(size=(vocab, d))
    w[p + "pos_embedding"] = rng.normal(size=(1, ctx, d))
    for i in range(layers):
        bp = f"{p}Encoder_0/encoderblock_{i}/"
        mha = bp + "MultiHeadDotProductAttention_0/"
        for n in ("query", "key", "value"):
            w[mha + f"{n}/kernel"] = rng.normal(size=(d, heads, dh))
            w[mha + f"{n}/bias"] = rng.normal(size=(heads, dh))
        w[mha + "out/kernel"] = rng.normal(size=(heads, dh, d))
        w[mha + "out/bias"] = rng.normal(size=(d,))
        w[bp + "LayerNorm_0/scale"] = np.ones(d)
        w[bp + "LayerNorm_0/bias"] = np.zeros(d)
        w[bp + "LayerNorm_1/scale"] = np.ones(d)
        w[bp + "LayerNorm_1/bias"] = np.zeros(d)
        w[bp + "MlpBlock_0/Dense_0/kernel"] = rng.normal(size=(d, 2 * d))
        w[bp + "MlpBlock_0/Dense_0/bias"] = rng.normal(size=(2 * d,))
        w[bp + "MlpBlock_0/Dense_1/kernel"] = rng.normal(size=(2 * d, d))
        w[bp + "MlpBlock_0/Dense_1/bias"] = rng.normal(size=(d,))
    w[p + "Encoder_0/encoder_norm/scale"] = np.ones(d)
    w[p + "Encoder_0/encoder_norm/bias"] = np.zeros(d)
    w[p + "head/kernel"] = rng.normal(size=(d, out_dim))
    w[p + "head/bias"] = rng.normal(size=(out_dim,))
    return {k: v.astype(np.float32) for k, v in w.items()}


def test_big_vision_text_params_load_into_tower():
    npz = _fake_big_vision_npz()
    params = load_big_vision_text_params(npz)

    tower = TextTransformer(
        context_length=12, vocab_size=64, width=32, heads=4, layers=2,
        mlp_ratio=2.0, output_dim=16, no_causal_mask=True, pool_type="last",
        proj_bias=True,
    )
    init = tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 12), jnp.int32))["params"]
    # structural match: same tree structure and shapes
    flat_init = jax.tree_util.tree_leaves_with_path(init)
    flat_conv = jax.tree_util.tree_leaves_with_path(params)
    assert len(flat_init) == len(flat_conv)
    for (pa, va), (pb, vb) in zip(sorted(flat_init, key=str), sorted(flat_conv, key=str)):
        assert str(pa) == str(pb)
        assert va.shape == np.asarray(vb).shape, (pa, va.shape, np.asarray(vb).shape)

    out = tower.apply({"params": params}, jnp.zeros((2, 12), jnp.int32))
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_mobileclip_text_renames():
    sd = {
        "text_encoder.embedding_layer.weight": np.zeros((10, 4)),
        "text_encoder.positional_embedding.pos_embed.pos_embed": np.zeros((1, 8, 4)),
        "text_encoder.transformer.0.pre_norm_mha.0.weight": np.zeros(4),
        "text_encoder.transformer.0.pre_norm_mha.1.qkv_proj.weight": np.zeros((12, 4)),
        "text_encoder.transformer.0.pre_norm_ffn.1.weight": np.zeros((8, 4)),
        "text_encoder.final_layer_norm.weight": np.zeros(4),
        "text_encoder.projection_layer.weight": np.zeros((6, 4)),
        "image_encoder.model.whatever": np.zeros(1),
    }
    out = convert_mobileclip_text_state_dict(sd)
    assert "text.token_embedding.weight" in out
    assert out["text.positional_embedding"].shape == (8, 4)
    assert "text.transformer.resblocks.0.ln_1.weight" in out
    assert "text.transformer.resblocks.0.attn.in_proj_weight" in out
    assert "text.transformer.resblocks.0.mlp.c_fc.weight" in out
    assert "text.ln_final.weight" in out
    assert "text.text_projection.weight" in out
    assert not any(k.startswith("image_encoder") for k in out)
