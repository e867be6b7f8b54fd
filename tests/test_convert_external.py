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


def _fake_big_vision_img(w, d=32, heads=4, layers=2, patch=8, img=16, mlp=64):
    rng = np.random.default_rng(1)
    dh = d // heads
    n = (img // patch) ** 2
    p = "params/img/"
    w[p + "embedding/kernel"] = rng.normal(size=(patch, patch, 3, d))
    w[p + "embedding/bias"] = rng.normal(size=(d,))
    w[p + "pos_embedding"] = rng.normal(size=(1, n, d))
    for i in range(layers):
        bp = f"{p}Transformer/encoderblock_{i}/"
        mha = bp + "MultiHeadDotProductAttention_0/"
        for nm in ("query", "key", "value"):
            w[mha + f"{nm}/kernel"] = rng.normal(size=(d, heads, dh))
            w[mha + f"{nm}/bias"] = rng.normal(size=(heads, dh))
        w[mha + "out/kernel"] = rng.normal(size=(heads, dh, d))
        w[mha + "out/bias"] = rng.normal(size=(d,))
        w[bp + "LayerNorm_0/scale"] = np.ones(d)
        w[bp + "LayerNorm_0/bias"] = np.zeros(d)
        w[bp + "LayerNorm_1/scale"] = np.ones(d)
        w[bp + "LayerNorm_1/bias"] = np.zeros(d)
        w[bp + "MlpBlock_0/Dense_0/kernel"] = rng.normal(size=(d, mlp))
        w[bp + "MlpBlock_0/Dense_0/bias"] = rng.normal(size=(mlp,))
        w[bp + "MlpBlock_0/Dense_1/kernel"] = rng.normal(size=(mlp, d))
        w[bp + "MlpBlock_0/Dense_1/bias"] = rng.normal(size=(d,))
    w[p + "Transformer/encoder_norm/scale"] = np.ones(d)
    w[p + "Transformer/encoder_norm/bias"] = np.zeros(d)
    mp = p + "MAPHead_0/"
    w[mp + "probe"] = rng.normal(size=(1, 1, d))
    mha = mp + "MultiHeadDotProductAttention_0/"
    for nm in ("query", "key", "value"):
        w[mha + f"{nm}/kernel"] = rng.normal(size=(d, heads, dh))
        w[mha + f"{nm}/bias"] = rng.normal(size=(heads, dh))
    w[mha + "out/kernel"] = rng.normal(size=(heads, dh, d))
    w[mha + "out/bias"] = rng.normal(size=(d,))
    w[mp + "LayerNorm_0/scale"] = np.ones(d)
    w[mp + "LayerNorm_0/bias"] = np.zeros(d)
    w[mp + "MlpBlock_0/Dense_0/kernel"] = rng.normal(size=(d, mlp))
    w[mp + "MlpBlock_0/Dense_0/bias"] = rng.normal(size=(mlp,))
    w[mp + "MlpBlock_0/Dense_1/kernel"] = rng.normal(size=(mlp, d))
    w[mp + "MlpBlock_0/Dense_1/bias"] = rng.normal(size=(d,))
    w["params/t"] = np.asarray([2.0])
    w["params/b"] = np.asarray([-10.0])
    return {k: np.asarray(v, np.float32) for k, v in w.items()}


def test_big_vision_image_params_load_into_siglip_tower():
    from refining_clip_via_dinov2_representations_tpu.models.convert_external import (
        load_big_vision_image_params,
    )
    from refining_clip_via_dinov2_representations_tpu.models.siglip import (
        SiglipVisionCfg,
        SiglipVisionTower,
    )

    npz = _fake_big_vision_img({})
    params = load_big_vision_image_params(npz)
    tower = SiglipVisionTower(
        cfg=SiglipVisionCfg(width=32, layers=2, heads=4, mlp_dim=64,
                            patch_size=8, image_size=16)
    )
    init = tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    assert jax.tree.map(lambda x: x.shape, init) == jax.tree.map(
        lambda x: np.asarray(x).shape, params
    )
    out = tower.apply({"params": params}, jnp.ones((1, 16, 16, 3)))
    assert np.all(np.isfinite(np.asarray(out)))


def test_full_big_vision_npz_loads_vit_b16_siglip(tmp_path):
    """ViT-B-16-SigLIP text+image big_vision npz load end-to-end through
    load_checkpoint (VERDICT missing #3 done-criterion)."""
    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model,
        get_model_config,
        load_checkpoint,
        parse_model_cfg,
    )

    w = _fake_big_vision_npz(d=768, heads=12, layers=12, vocab=32000, ctx=64,
                             out_dim=768)
    # text mlp in the helper is 2*d; big_vision SigLIP uses 3072 -> adjust
    w = {k: v for k, v in w.items()}
    _fake_big_vision_img(w, d=768, heads=12, layers=12, patch=16, img=224,
                         mlp=3072)
    # fix text mlp dims to the model's (width*mlp_ratio = 3072)
    rng = np.random.default_rng(3)
    for i in range(12):
        bp = f"params/txt/Encoder_0/encoderblock_{i}/"
        w[bp + "MlpBlock_0/Dense_0/kernel"] = rng.normal(size=(768, 3072)).astype(np.float32)
        w[bp + "MlpBlock_0/Dense_0/bias"] = np.zeros(3072, np.float32)
        w[bp + "MlpBlock_0/Dense_1/kernel"] = rng.normal(size=(3072, 768)).astype(np.float32)
        w[bp + "MlpBlock_0/Dense_1/bias"] = np.zeros(768, np.float32)
    path = tmp_path / "siglip.npz"
    np.savez(path, **w)

    cfg = parse_model_cfg(get_model_config("ViT-B-16-SigLIP"))
    model = build_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
        jnp.zeros((1, 64), jnp.int32),
    )
    variables, (missing, unexpected) = load_checkpoint(
        model, variables, str(path), strict=True
    )
    assert not missing and not unexpected, (missing[:5], unexpected[:5])
    assert float(variables["params"]["logit_scale"]) == 2.0
    assert float(variables["params"]["logit_bias"]) == -10.0
    out = model.apply(
        variables, jnp.ones((1, 224, 224, 3)), jnp.zeros((1, 64), jnp.int32)
    )
    assert np.all(np.isfinite(np.asarray(out["image_features"])))
