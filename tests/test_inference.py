"""Serving engine tests: bucketed batching, AOT warmup, StableHLO export.

The reference has no serving path (SURVEY §2.4 — its eval scripts re-trace
per batch); `inference.py` is the TPU-native production-serving story.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.inference import (
    ClipInferenceEngine,
    load_exported,
)
from refining_clip_via_dinov2_representations_tpu.models import (
    build_model,
    parse_model_cfg,
)

TINY_CFG = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 16, "patch_size": 8, "width": 32, "layers": 2, "head_width": 16},
    "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 4, "layers": 2},
}


@pytest.fixture(scope="module")
def engine():
    model = build_model(parse_model_cfg(TINY_CFG))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 12), jnp.int32)
    )
    return ClipInferenceEngine(
        model, variables, image_size=(16, 16), context_length=12,
        buckets=(2, 4), dtype=jnp.float32,
    )


def test_bucketed_encode_matches_direct(engine):
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(3, 16, 16, 3)).astype(np.float32)  # pads 3 -> 4
    feats = engine.encode_image(imgs)
    assert feats.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-5)

    direct = engine.model.apply(
        engine.variables, jnp.asarray(imgs), method="encode_image", normalize=True
    )
    np.testing.assert_allclose(feats, np.asarray(direct), atol=1e-5)


def test_chunking_past_top_bucket(engine):
    rng = np.random.default_rng(1)
    texts = rng.integers(1, 63, size=(11, 12)).astype(np.int32)  # 11 > top bucket 4
    feats = engine.encode_text(texts)
    assert feats.shape == (11, 32)
    # row i must not depend on its neighbours in the chunked path
    one = engine.encode_text(texts[5:6])
    np.testing.assert_allclose(feats[5], one[0], atol=1e-5)


def test_warmup_compiles_all_buckets(engine):
    engine.warmup()  # must not raise; compiles 2 buckets x 2 towers


def test_similarity_uses_logit_scale(engine):
    rng = np.random.default_rng(2)
    sims = engine.similarity(
        rng.normal(size=(2, 16, 16, 3)).astype(np.float32),
        rng.integers(1, 63, size=(3, 12)).astype(np.int32),
    )
    assert sims.shape == (2, 3)
    scale = float(np.exp(np.asarray(engine.variables["params"]["logit_scale"])))
    assert np.all(np.abs(sims) <= scale + 1e-4)


def test_export_roundtrip(engine, tmp_path):
    """StableHLO artifact reloads and reproduces the engine's features
    without model code."""
    written = engine.export(str(tmp_path))
    assert set(written) == {
        "encode_image_b2", "encode_image_b4", "encode_text_b2", "encode_text_b4"
    }
    fn = load_exported(written["encode_image_b2"])
    rng = np.random.default_rng(3)
    imgs = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    out = np.asarray(fn(jnp.asarray(imgs)))
    expected = engine.encode_image(imgs)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_engine_bn_tower():
    """The engine serves BN towers (RN50): batch_stats flow through
    encode_image in inference mode."""
    import dataclasses

    import refining_clip_via_dinov2_representations_tpu as oc

    cfg = oc.parse_model_cfg(oc.get_model_config("RN50"))
    cfg = dataclasses.replace(
        cfg, vision_cfg=dataclasses.replace(cfg.vision_cfg, image_size=32)
    )
    model = oc.build_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 77), jnp.int32)
    )
    assert "batch_stats" in variables
    engine = ClipInferenceEngine(
        model, variables, image_size=(32, 32), context_length=77,
        buckets=(2,), dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    feats = engine.encode_image(rng.normal(size=(3, 32, 32, 3)).astype(np.float32))
    assert feats.shape == (3, cfg.embed_dim)
    assert np.all(np.isfinite(feats))
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-5)


def test_int8_weight_only_quantization():
    """Weight-only int8 engine: features within cosine 0.999 of fp32 and the
    big weight leaves really are stored as int8."""
    model = build_model(parse_model_cfg(TINY_CFG))
    rng = np.random.default_rng(7)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 12), jnp.int32)
    )
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(scale=0.05, size=a.shape), a.dtype), variables
    )
    kw = dict(image_size=(16, 16), context_length=12, buckets=(4,), dtype=jnp.float32)
    fp = ClipInferenceEngine(model, variables, **kw)
    q8 = ClipInferenceEngine(model, variables, quantize="int8", quantize_min_size=0, **kw)

    # int8 storage: at least one leaf is int8, none of the quantized dicts
    # carry fp32 weight copies
    leaves = jax.tree_util.tree_leaves(q8.variables)
    assert any(getattr(x, "dtype", None) == jnp.int8 for x in leaves)
    # and no fp32 matmul weight survives alongside (min_size=0: every >=2-D
    # float leaf must have been replaced; the only remaining floats are the
    # per-channel scales, 0/1-D params, and lookup tables — embedding /
    # positional-embedding leaves are deliberately NOT quantized since a
    # row-gather gets no bandwidth win from int8)
    from refining_clip_via_dinov2_representations_tpu.inference import (
        _QUANT_SKIP_KEYS,
        _QUANT_SKIP_PREFIXES,
    )

    def _skipped(path):
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        return any(
            k in _QUANT_SKIP_KEYS or k.startswith(_QUANT_SKIP_PREFIXES)
            for k in keys
        )

    float_mats = [
        path
        for path, x in jax.tree_util.tree_leaves_with_path(q8.variables)
        if getattr(x, "ndim", 0) >= 2
        and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        and x.shape[0] > 1
    ]
    assert float_mats, "embedding tables should have stayed float"
    assert all(_skipped(p) for p in float_mats), float_mats

    imgs = rng.normal(size=(3, 16, 16, 3)).astype(np.float32)
    texts = rng.integers(1, 63, size=(3, 12)).astype(np.int32)
    for a, b in ((fp.encode_image(imgs), q8.encode_image(imgs)),
                 (fp.encode_text(texts), q8.encode_text(texts))):
        cos = np.sum(a * b, axis=-1)  # both unit-norm
        assert np.all(cos > 0.999), cos

    # quantized similarity still applies logit_scale (and bias when present)
    sims = q8.similarity(imgs, texts)
    assert sims.shape == (3, 3)


def test_int8_engine_export_roundtrip(tmp_path):
    """StableHLO export bakes the int8 weights + scales; reload matches."""
    model = build_model(parse_model_cfg(TINY_CFG))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 12), jnp.int32)
    )
    eng = ClipInferenceEngine(
        model, variables, image_size=(16, 16), context_length=12,
        buckets=(2,), dtype=jnp.float32, quantize="int8", quantize_min_size=0,
    )
    written = eng.export(str(tmp_path))
    fn = load_exported(written["encode_text_b2"])
    rng = np.random.default_rng(11)
    texts = rng.integers(1, 63, size=(2, 12)).astype(np.int32)
    out = np.asarray(fn(jnp.asarray(texts)))
    np.testing.assert_allclose(out, eng.encode_text(texts), atol=1e-5)


def test_engine_siglip_similarity_includes_bias():
    """SigLIP models carry an additive logit_bias; `similarity` must apply
    it (get_logits semantics, clip.py) — regression for the serving path."""
    import dataclasses

    import refining_clip_via_dinov2_representations_tpu as oc

    cfg = oc.parse_model_cfg(oc.get_model_config("ViT-B-16-SigLIP"))
    cfg = dataclasses.replace(
        cfg, vision_cfg=dataclasses.replace(cfg.vision_cfg, image_size=32)
    )
    model = oc.build_model(cfg)
    ctx = cfg.text_cfg.context_length
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, ctx), jnp.int32)
    )
    assert "logit_bias" in variables["params"]
    engine = ClipInferenceEngine(
        model, variables, image_size=(32, 32), context_length=ctx,
        buckets=(2,), dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    txts = rng.integers(1, 100, size=(2, ctx)).astype(np.int32)
    sims = engine.similarity(imgs, txts)

    img_f = engine.encode_image(imgs)
    txt_f = engine.encode_text(txts)
    scale = float(np.exp(np.asarray(variables["params"]["logit_scale"])))
    bias = float(np.asarray(variables["params"]["logit_bias"]))
    np.testing.assert_allclose(sims, scale * img_f @ txt_f.T + bias, atol=1e-5)


def test_engine_mesh_sharded_serving():
    """Multi-device serving: a (data=4, model=2) mesh TP-shards the weights
    and data-shards request batches; outputs must match the single-device
    engine bit-for-bit (same math, GSPMD-partitioned)."""
    from refining_clip_via_dinov2_representations_tpu.parallel.mesh import (
        create_mesh,
    )

    model = build_model(parse_model_cfg(TINY_CFG))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 12), jnp.int32)
    )
    single = ClipInferenceEngine(
        model, variables, image_size=(16, 16), context_length=12,
        buckets=(2, 8), dtype=jnp.float32,
    )
    mesh = create_mesh(data=4, model=2)
    sharded = ClipInferenceEngine(
        model, variables, image_size=(16, 16), context_length=12,
        buckets=(2, 8), dtype=jnp.float32, mesh=mesh,
    )
    # buckets round up to multiples of the data-axis size (4)
    assert sharded.buckets == (4, 8)

    rng = np.random.default_rng(7)
    imgs = rng.normal(size=(5, 16, 16, 3)).astype(np.float32)  # pads 5 -> 8
    texts = rng.integers(1, 63, size=(3, 12)).astype(np.int32)  # pads 3 -> 4

    np.testing.assert_allclose(
        sharded.encode_image(imgs), single.encode_image(imgs), atol=1e-5
    )
    np.testing.assert_allclose(
        sharded.encode_text(texts), single.encode_text(texts), atol=1e-5
    )
    # warmup compiles the sharded buckets without error
    sharded.warmup()


def test_engine_mesh_sharded_export_roundtrip(tmp_path):
    """Mesh-sharded export: params ride as call arguments (npz + sharding
    manifest), and `load_exported_sharded` reassembles on a same-shape mesh
    without any model code — outputs equal the live engine's."""
    from refining_clip_via_dinov2_representations_tpu.inference import (
        load_exported_sharded,
    )
    from refining_clip_via_dinov2_representations_tpu.parallel.mesh import (
        create_mesh,
    )

    model = build_model(parse_model_cfg(TINY_CFG))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 12), jnp.int32)
    )
    mesh = create_mesh(data=4, model=2)
    sharded = ClipInferenceEngine(
        model, variables, image_size=(16, 16), context_length=12,
        buckets=(4,), dtype=jnp.float32, mesh=mesh,
    )
    written = sharded.export(str(tmp_path))
    assert "params" in written and "manifest" in written

    rng = np.random.default_rng(11)
    imgs = rng.normal(size=(4, 16, 16, 3)).astype(np.float32)
    texts = rng.integers(1, 63, size=(4, 12)).astype(np.int32)

    # a FRESH mesh object (same axes) on the reload side
    mesh2 = create_mesh(data=4, model=2)
    run_img = load_exported_sharded(str(tmp_path), "encode_image_b4", mesh2)
    run_txt = load_exported_sharded(str(tmp_path), "encode_text_b4", mesh2)
    np.testing.assert_allclose(
        np.asarray(run_img(imgs)), sharded.encode_image(imgs), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(run_txt(texts)), sharded.encode_text(texts), atol=1e-6
    )

    # topology mismatch is a clear error, not a broken artifact
    bad_mesh = create_mesh(data=8, model=1)
    with pytest.raises(ValueError, match="mesh mismatch"):
        load_exported_sharded(str(tmp_path), "encode_image_b4", bad_mesh)

    # both encoders loaded from one artifact share ONE device copy of the
    # weights (GB-scale checkpoints: N loads must not mean N x weight HBM)
    from refining_clip_via_dinov2_representations_tpu.inference import (
        _SHARDED_PARAMS_CACHE,
    )
    keys = [k for k in _SHARDED_PARAMS_CACHE if k[0] == str(tmp_path)]
    assert len(keys) == 1, keys


def test_engine_sharded_reexport_invalidates_param_cache(tmp_path):
    """Re-exporting updated weights to the SAME directory must not serve the
    stale cached params on reload (ADVICE r4: cache keyed on path+mesh only);
    the stale entry is dropped so its device copies can be collected."""
    import time

    from refining_clip_via_dinov2_representations_tpu.inference import (
        _SHARDED_PARAMS_CACHE,
        load_exported_sharded,
    )
    from refining_clip_via_dinov2_representations_tpu.parallel.mesh import (
        create_mesh,
    )

    model = build_model(parse_model_cfg(TINY_CFG))
    mesh = create_mesh(data=4, model=2)
    rng = np.random.default_rng(7)
    imgs = rng.normal(size=(4, 16, 16, 3)).astype(np.float32)

    outs = []
    for seed in (0, 1):
        variables = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, 3)),
            jnp.zeros((1, 12), jnp.int32),
        )
        engine = ClipInferenceEngine(
            model, variables, image_size=(16, 16), context_length=12,
            buckets=(4,), dtype=jnp.float32, mesh=mesh,
        )
        engine.export(str(tmp_path))
        run = load_exported_sharded(str(tmp_path), "encode_image_b4", mesh)
        outs.append(np.asarray(run(imgs)))
        if seed == 0:
            time.sleep(0.01)  # guarantee a distinguishable mtime_ns

    assert not np.allclose(outs[0], outs[1])  # new weights actually served
    np.testing.assert_allclose(outs[1], engine.encode_image(imgs), atol=1e-6)
    keys = [k for k in _SHARDED_PARAMS_CACHE if k[0] == str(tmp_path)]
    assert len(keys) == 1, keys  # stale seed-0 entry evicted, not retained


def test_engine_mesh_sharded_export_bf16_bit_exact(tmp_path):
    """bf16 param leaves are stored as raw bit patterns (uint16), not
    widened to fp32: the artifact stays at bf16 size and the roundtrip is
    bit-exact."""
    from refining_clip_via_dinov2_representations_tpu.inference import (
        load_exported_sharded,
    )
    from refining_clip_via_dinov2_representations_tpu.parallel.mesh import (
        create_mesh,
    )

    model = build_model(parse_model_cfg(TINY_CFG))
    variables = model.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 12), jnp.int32)
    )
    variables = jax.tree.map(lambda a: a.astype(jnp.bfloat16), variables)
    mesh = create_mesh(data=4, model=2)
    sharded = ClipInferenceEngine(
        model, variables, image_size=(16, 16), context_length=12,
        buckets=(4,), dtype=jnp.bfloat16, mesh=mesh,
    )
    sharded.export(str(tmp_path))

    # on-disk leaves are uint16 bit patterns, half the fp32-widened size
    with np.load(tmp_path / "params.npz") as data:
        dtypes = {data[k].dtype for k in data.files}
    assert dtypes == {np.dtype(np.uint16)}, dtypes

    run_img = load_exported_sharded(str(tmp_path), "encode_image_b4", mesh)
    rng = np.random.default_rng(3)
    imgs = rng.normal(size=(4, 16, 16, 3)).astype(np.float32)
    live = sharded.encode_image(imgs)
    reloaded = np.asarray(run_img(imgs))
    assert np.array_equal(reloaded, live)  # bit-exact params -> bit-exact out


TINY_COCA_CFG = {
    "embed_dim": 32,
    "vision_cfg": {
        "image_size": 16, "patch_size": 8, "width": 32, "layers": 2,
        "head_width": 16, "attentional_pool": True, "attn_pooler_queries": 6,
        "attn_pooler_heads": 2, "output_tokens": True,
    },
    "text_cfg": {
        "context_length": 12, "vocab_size": 64, "width": 32, "heads": 4,
        "layers": 2, "embed_cls": True, "output_tokens": True,
    },
    "multimodal_cfg": {
        "context_length": 12, "vocab_size": 64, "width": 32, "heads": 4,
        "layers": 2, "attn_pooler_heads": 2,
    },
    "custom_text": True,
}


def _tiny_coca():
    model = build_model(parse_model_cfg(TINY_COCA_CFG))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1, 12), jnp.int32),
    )
    return model, variables


def test_caption_tokens_matches_direct_beam():
    from refining_clip_via_dinov2_representations_tpu.models.coca import (
        generate_beam,
    )

    model, variables = _tiny_coca()
    eng = ClipInferenceEngine(
        model, variables, image_size=(16, 16), context_length=12,
        buckets=(2, 4), dtype=jnp.float32,
    )
    imgs = np.random.default_rng(0).normal(size=(3, 16, 16, 3)).astype(np.float32)
    toks = eng.caption_tokens(
        imgs, seq_len=8, num_beams=4, num_beam_groups=2,
        min_seq_len=2, sot_token_id=62, eot_token_id=63,
    )
    assert toks.shape == (3, 8) and (toks[:, 0] == 62).all()
    # bucketed (padded 3->4) rows == direct full-batch beam search
    direct = generate_beam(
        model, variables, jnp.asarray(imgs), num_beams=4, num_beam_groups=2,
        seq_len=8, sot_token_id=62, eot_token_id=63, min_seq_len=2,
    )
    np.testing.assert_array_equal(toks, np.asarray(direct))


def test_caption_tokens_int8_runs():
    model, variables = _tiny_coca()
    eng = ClipInferenceEngine(
        model, variables, image_size=(16, 16), context_length=12,
        buckets=(2,), dtype=jnp.float32, quantize="int8", quantize_min_size=64,
    )
    imgs = np.random.default_rng(1).normal(size=(2, 16, 16, 3)).astype(np.float32)
    toks = eng.caption_tokens(imgs, seq_len=6, num_beams=2, num_beam_groups=1,
                              min_seq_len=2, sot_token_id=62, eot_token_id=63)
    assert toks.shape == (2, 6) and (toks[:, 0] == 62).all()


def test_caption_tokens_requires_coca(engine):
    with pytest.raises(TypeError, match="CoCa"):
        engine.caption_tokens(np.zeros((1, 16, 16, 3), np.float32))
