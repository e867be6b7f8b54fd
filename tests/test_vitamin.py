"""ViTamin tower structural tests (no oracle in this environment — see
models/vitamin.py ORACLE STATUS)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.models.vitamin import (
    VITAMIN_DIMS,
    ViTaminCfg,
    ViTaminVisionTower,
    convert_timm_vitamin_state_dict,
)

TINY = ViTaminCfg(
    stem_width=8, conv_dims=(8, 16), conv_depths=(1, 2), embed_dim=32,
    depth=2, heads=4, image_size=32,
)


def test_stage_strides_and_shapes():
    tower = ViTaminVisionTower(cfg=TINY, output_dim=20, output_tokens=True)
    x = jnp.zeros((2, 32, 32, 3))
    v = tower.init(jax.random.PRNGKey(0), x)
    pooled, tokens = tower.apply(v, x)
    # /16 tokens: 32/16 = 2x2 grid
    assert tokens.shape == (2, 4, 32)
    assert pooled.shape == (2, 20)
    p = v["params"]
    # GeGLU gating params + inner norm present
    mlp = p["resblocks_0"]["mlp"]
    assert set(mlp) >= {"norm", "w0", "w1", "w2"}
    assert mlp["w0"]["kernel"].shape == (32, 64)  # ratio-2 hidden
    # MBConv expansion ratio 4 + depthwise conv
    blk = p["stage1_block0"]
    assert blk["conv1_1x1"]["kernel"].shape[-1] == 64  # 16 * 4
    assert blk["conv2_kxk"]["kernel"].shape[2] == 1    # depthwise (grouped)
    # stride-2 first blocks carry the avg-pool shortcut conv
    assert "shortcut" in blk


def test_geglu_gating_math():
    from refining_clip_via_dinov2_representations_tpu.models.vitamin import GeGluMlp

    m = GeGluMlp(hidden=8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 4)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    # manual recompute
    p = v["params"]
    xn = (x - x.mean(-1, keepdims=True)) / jnp.sqrt(x.var(-1, keepdims=True) + 1e-6)
    xn = xn * p["norm"]["scale"] + p["norm"]["bias"]
    gate = xn @ p["w0"]["kernel"] + p["w0"]["bias"]
    val = xn @ p["w1"]["kernel"] + p["w1"]["bias"]
    want = (jax.nn.gelu(gate, approximate=False) * val) @ p["w2"]["kernel"] + p["w2"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_converter_roundtrip_synthetic_timm_layout():
    rng = np.random.default_rng(0)
    c = TINY

    sd = {}
    pre = "visual.trunk."

    def add_conv(name, cin, cout, k):
        sd[pre + name + ".weight"] = rng.normal(size=(cout, cin, k, k)).astype(np.float32)
        sd[pre + name + ".bias"] = rng.normal(size=(cout,)).astype(np.float32)

    add_conv("patch_embed.backbone.stem.conv1", 3, c.stem_width, 3)
    sd[pre + "patch_embed.backbone.stem.norm1.weight"] = np.ones(c.stem_width, np.float32)
    sd[pre + "patch_embed.backbone.stem.norm1.bias"] = np.zeros(c.stem_width, np.float32)
    add_conv("patch_embed.backbone.stem.conv2", c.stem_width, c.stem_width, 3)

    chans = [c.stem_width] + list(c.conv_dims)
    for si, depth in enumerate(c.conv_depths):
        for bi in range(depth):
            cin = chans[si] if bi == 0 else chans[si + 1]
            cout = chans[si + 1]
            base = f"patch_embed.backbone.stages.{si}.blocks.{bi}"
            sd[pre + base + ".pre_norm.weight"] = np.ones(cin, np.float32)
            sd[pre + base + ".pre_norm.bias"] = np.zeros(cin, np.float32)
            mid = cout * 4
            add_conv(base + ".conv1_1x1", cin, mid, 1)
            sd[pre + base + ".conv2_kxk.weight"] = rng.normal(size=(mid, 1, 3, 3)).astype(np.float32)
            sd[pre + base + ".conv2_kxk.bias"] = rng.normal(size=(mid,)).astype(np.float32)
            add_conv(base + ".conv3_1x1", mid, cout, 1)
            if bi == 0 or cin != cout:
                add_conv(base + ".shortcut", cin, cout, 1)
    sd[pre + "patch_embed.backbone.pool.norm.weight"] = np.ones(c.conv_dims[1], np.float32)
    sd[pre + "patch_embed.backbone.pool.norm.bias"] = np.zeros(c.conv_dims[1], np.float32)
    add_conv("patch_embed.backbone.pool.proj", c.conv_dims[1], c.embed_dim, 3)

    n = (c.image_size // 16) ** 2
    sd[pre + "pos_embed"] = rng.normal(size=(1, n, c.embed_dim)).astype(np.float32)
    for i in range(c.depth):
        b = f"blocks.{i}"
        for nn_ in ("norm1", "norm2"):
            sd[pre + f"{b}.{nn_}.weight"] = np.ones(c.embed_dim, np.float32)
            sd[pre + f"{b}.{nn_}.bias"] = np.zeros(c.embed_dim, np.float32)
        sd[pre + f"{b}.attn.qkv.weight"] = rng.normal(size=(3 * c.embed_dim, c.embed_dim)).astype(np.float32)
        sd[pre + f"{b}.attn.qkv.bias"] = rng.normal(size=(3 * c.embed_dim,)).astype(np.float32)
        sd[pre + f"{b}.attn.proj.weight"] = rng.normal(size=(c.embed_dim, c.embed_dim)).astype(np.float32)
        sd[pre + f"{b}.attn.proj.bias"] = rng.normal(size=(c.embed_dim,)).astype(np.float32)
        hid = c.embed_dim * 2
        sd[pre + f"{b}.mlp.norm.weight"] = np.ones(c.embed_dim, np.float32)
        sd[pre + f"{b}.mlp.norm.bias"] = np.zeros(c.embed_dim, np.float32)
        for w, shape in (("w0", (hid, c.embed_dim)), ("w1", (hid, c.embed_dim)),
                         ("w2", (c.embed_dim, hid))):
            sd[pre + f"{b}.mlp.{w}.weight"] = rng.normal(size=shape).astype(np.float32)
            sd[pre + f"{b}.mlp.{w}.bias"] = rng.normal(size=(shape[0],)).astype(np.float32)
    sd[pre + "fc_norm.weight"] = np.ones(c.embed_dim, np.float32)
    sd[pre + "fc_norm.bias"] = np.zeros(c.embed_dim, np.float32)
    sd[pre + "head.weight"] = rng.normal(size=(20, c.embed_dim)).astype(np.float32)

    params = convert_timm_vitamin_state_dict(sd, c)
    tower = ViTaminVisionTower(cfg=c, output_dim=20)
    ref = tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    assert jax.tree.map(lambda x: x.shape, ref) == jax.tree.map(
        lambda x: np.asarray(x).shape, params
    )
    out = tower.apply({"params": params}, jnp.ones((1, 32, 32, 3)))
    assert np.all(np.isfinite(np.asarray(out)))


def test_create_model_vitamin_s():
    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model,
        get_model_config,
        parse_model_cfg,
    )

    cfg = parse_model_cfg(get_model_config("ViTamin-S"))
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 224, 224, 3))
    txt = jnp.zeros((1, 77), jnp.int32)
    variables = model.init(rng, img, txt)
    out = model.apply(variables, img, txt)
    assert out["image_features"].shape == (1, 384)
    assert "stage0_block0" in variables["params"]["visual"]
