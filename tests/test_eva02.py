"""EVA02 tower: rope fixtures, swiglu/sub-LN structure, converter mapping.

No timm/torch EVA02 oracle exists in this environment (zero egress), so
numerics are pinned by hand-derived properties of the published algorithm
(rotation invariants, relative-position property, gating identity) plus
structural checks of the checkpoint converter on synthetic timm-layout
state dicts. Value-level verification vs real checkpoints is flagged in
models/eva02.py's docstring.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.models.eva02 import (
    EVA02_DIMS,
    Eva02Cfg,
    Eva02VisionTower,
    apply_rope,
    build_rope_embed,
    convert_timm_eva02_state_dict,
)

TINY = Eva02Cfg(
    width=32, layers=2, heads=4, mlp_hidden=24, patch_size=8, image_size=16,
    ref_feat_shape=(4, 4),
)


def test_rope_preserves_norm_and_skips_cls():
    sin, cos = build_rope_embed((2, 2), 8, ref_feat_shape=None)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 5, 8)), jnp.float32)
    y = apply_rope(x, jnp.asarray(sin), jnp.asarray(cos))
    # CLS untouched
    np.testing.assert_array_equal(np.asarray(y[:, :, 0]), np.asarray(x[:, :, 0]))
    # rotation preserves the L2 norm of every token
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y[0, 0, 1:]), axis=-1),
        np.linalg.norm(np.asarray(x[0, 0, 1:]), axis=-1),
        rtol=1e-5,
    )


def test_rope_relative_position_property():
    """q.k after rotation depends only on the coordinate difference —
    the defining property of rotary embeddings, per axis."""
    d = 16
    sin, cos = build_rope_embed((1, 8), d, ref_feat_shape=None)  # 1D row
    rng = np.random.default_rng(1)
    q = rng.normal(size=(d,)).astype(np.float32)
    k = rng.normal(size=(d,)).astype(np.float32)

    def rot(v, i):
        x = jnp.asarray(v)[None, None, None, :]
        pad = jnp.zeros_like(x)
        full = jnp.concatenate([pad] + [x if j == i else pad for j in range(8)], axis=2)
        out = apply_rope(full, jnp.asarray(sin), jnp.asarray(cos))
        return np.asarray(out[0, 0, i + 1])

    # pairs with the same positional difference of 2
    d1 = float(np.dot(rot(q, 2), rot(k, 0)))
    d2 = float(np.dot(rot(q, 5), rot(k, 3)))
    assert d1 == pytest.approx(d2, rel=1e-4)
    # and a different difference gives a different value
    d3 = float(np.dot(rot(q, 4), rot(k, 0)))
    assert abs(d1 - d3) > 1e-4


def test_ref_feat_shape_rescales_coordinates():
    s1, c1 = build_rope_embed((4, 4), 8, ref_feat_shape=(16, 16))
    s2, c2 = build_rope_embed((16, 16), 8, ref_feat_shape=(16, 16))
    # position (1,1) of the 4-grid maps to coordinate 4 of the 16-ref frame,
    # i.e. the same angles as position (4,4) of the 16-grid
    np.testing.assert_allclose(s1[1 * 4 + 1], s2[4 * 16 + 4], atol=1e-6)


def test_tower_forward_shapes_and_variants():
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 16, 16, 3))
    tower = Eva02VisionTower(cfg=TINY, output_dim=20)
    vars_ = tower.init(rng, x)
    out = tower.apply(vars_, x)
    assert out.shape == (2, 20)
    # swiglu + sub-LN params present
    blk = vars_["params"]["resblocks_0"]
    assert "fc1_g" in blk["mlp"] and "fc1_x" in blk["mlp"] and "norm" in blk["mlp"]
    assert "norm" in blk["attn"]

    # post-norm / plain-MLP variant (EVA-CLIP-E style)
    cfg_e = Eva02Cfg(
        width=32, layers=2, heads=4, mlp_hidden=64, patch_size=8, image_size=16,
        swiglu=False, rope=False, subln=False, post_norm=True, ref_feat_shape=None,
    )
    tower_e = Eva02VisionTower(cfg=cfg_e, output_dim=20)
    vars_e = tower_e.init(rng, x)
    blk_e = vars_e["params"]["resblocks_0"]
    assert "fc1" in blk_e["mlp"] and "fc1_g" not in blk_e["mlp"]
    assert "norm" not in blk_e["attn"]
    assert tower_e.apply(vars_e, x).shape == (2, 20)


def _timm_state_dict(cfg: Eva02Cfg, fused: bool, rng):
    """Synthetic timm-layout EVA02 checkpoint."""
    d, hid, p = cfg.width, cfg.mlp_hidden, cfg.patch_size
    n = (cfg.image_size // p) ** 2
    sd = {
        "visual.trunk.cls_token": rng.normal(size=(1, 1, d)),
        "visual.trunk.pos_embed": rng.normal(size=(1, n + 1, d)),
        "visual.trunk.patch_embed.proj.weight": rng.normal(size=(d, 3, p, p)),
        "visual.trunk.patch_embed.proj.bias": rng.normal(size=(d,)),
        "visual.trunk.norm.weight": rng.normal(size=(d,)),
        "visual.trunk.norm.bias": rng.normal(size=(d,)),
        "visual.trunk.head.weight": rng.normal(size=(20, d)),
        "visual.trunk.head.bias": rng.normal(size=(20,)),
    }
    for i in range(cfg.layers):
        b = f"visual.trunk.blocks.{i}."
        sd[b + "norm1.weight"] = rng.normal(size=(d,))
        sd[b + "norm1.bias"] = rng.normal(size=(d,))
        sd[b + "norm2.weight"] = rng.normal(size=(d,))
        sd[b + "norm2.bias"] = rng.normal(size=(d,))
        if fused:
            sd[b + "attn.qkv.weight"] = rng.normal(size=(3 * d, d))
            sd[b + "attn.q_bias"] = rng.normal(size=(d,))
            sd[b + "attn.v_bias"] = rng.normal(size=(d,))
        else:
            sd[b + "attn.q_proj.weight"] = rng.normal(size=(d, d))
            sd[b + "attn.q_proj.bias"] = rng.normal(size=(d,))
            sd[b + "attn.k_proj.weight"] = rng.normal(size=(d, d))
            sd[b + "attn.v_proj.weight"] = rng.normal(size=(d, d))
            sd[b + "attn.v_proj.bias"] = rng.normal(size=(d,))
        if cfg.subln:
            sd[b + "attn.norm.weight"] = rng.normal(size=(d,))
            sd[b + "attn.norm.bias"] = rng.normal(size=(d,))
        sd[b + "attn.proj.weight"] = rng.normal(size=(d, d))
        sd[b + "attn.proj.bias"] = rng.normal(size=(d,))
        if cfg.swiglu:
            sd[b + "mlp.fc1_g.weight"] = rng.normal(size=(hid, d))
            sd[b + "mlp.fc1_g.bias"] = rng.normal(size=(hid,))
            sd[b + "mlp.fc1_x.weight"] = rng.normal(size=(hid, d))
            sd[b + "mlp.fc1_x.bias"] = rng.normal(size=(hid,))
            sd[b + "mlp.norm.weight"] = rng.normal(size=(hid,))
            sd[b + "mlp.norm.bias"] = rng.normal(size=(hid,))
        else:
            sd[b + "mlp.fc1.weight"] = rng.normal(size=(hid, d))
            sd[b + "mlp.fc1.bias"] = rng.normal(size=(hid,))
        sd[b + "mlp.fc2.weight"] = rng.normal(size=(d, hid))
        sd[b + "mlp.fc2.bias"] = rng.normal(size=(d,))
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


@pytest.mark.parametrize("fused", [False, True])
def test_converter_produces_loadable_params(fused):
    rng = np.random.default_rng(2)
    sd = _timm_state_dict(TINY, fused=fused, rng=rng)
    params = convert_timm_eva02_state_dict(sd, TINY)

    tower = Eva02VisionTower(cfg=TINY, output_dim=20)
    ref = tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, params)
    assert ref_shapes == got_shapes, (ref_shapes, got_shapes)

    out = tower.apply({"params": params}, jnp.ones((1, 16, 16, 3)))
    assert np.all(np.isfinite(np.asarray(out)))
    # unfused k_proj has no bias -> k slice of the fused bias must be zero
    if not fused:
        bias = np.asarray(params["resblocks_0"]["attn"]["in_proj_bias"])
        d = TINY.width
        assert np.all(bias[d:2 * d] == 0)


def test_create_model_eva02_b16():
    """create_model('EVA02-B-16') builds the native tower end-to-end."""
    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model,
        get_model_config,
        parse_model_cfg,
    )

    cfg = parse_model_cfg(get_model_config("EVA02-B-16"))
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 224, 224, 3))
    txt = jnp.zeros((1, 77), jnp.int32)
    variables = model.init(rng, img, txt)
    out = model.apply(variables, img, txt)
    assert out["image_features"].shape == (1, 512)
    assert out["text_features"].shape == (1, 512)
    # rope + swiglu really present in the built tower
    blk = variables["params"]["visual"]["resblocks_0"]
    assert "fc1_g" in blk["mlp"]
