"""EVA01 tower: registry build + timm-layout converter structural test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.models import (
    build_model,
    get_model_config,
    parse_model_cfg,
)
from refining_clip_via_dinov2_representations_tpu.models.eva import (
    convert_timm_eva_state_dict,
)
from refining_clip_via_dinov2_representations_tpu.models.transformer import (
    VisionTransformer,
)


def _fake_timm_eva_sd(width=32, layers=2, heads=4, mlp=64, patch=14, img=28, out=16):
    rng = np.random.default_rng(0)
    grid = img // patch
    sd = {
        "visual.trunk.cls_token": rng.normal(size=(1, 1, width)),
        "visual.trunk.pos_embed": rng.normal(size=(1, grid * grid + 1, width)),
        "visual.trunk.patch_embed.proj.weight": rng.normal(size=(width, 3, patch, patch)),
        "visual.trunk.patch_embed.proj.bias": rng.normal(size=(width,)),
        "visual.trunk.norm.weight": np.ones(width),
        "visual.trunk.norm.bias": np.zeros(width),
        "visual.trunk.head.weight": rng.normal(size=(out, width)),
        "visual.trunk.head.bias": rng.normal(size=(out,)),
    }
    for i in range(layers):
        b = f"visual.trunk.blocks.{i}."
        sd[b + "norm1.weight"] = np.ones(width)
        sd[b + "norm1.bias"] = np.zeros(width)
        sd[b + "attn.qkv.weight"] = rng.normal(size=(3 * width, width))
        sd[b + "attn.q_bias"] = rng.normal(size=(width,))
        sd[b + "attn.v_bias"] = rng.normal(size=(width,))
        sd[b + "attn.proj.weight"] = rng.normal(size=(width, width))
        sd[b + "attn.proj.bias"] = rng.normal(size=(width,))
        sd[b + "norm2.weight"] = np.ones(width)
        sd[b + "norm2.bias"] = np.zeros(width)
        sd[b + "mlp.fc1.weight"] = rng.normal(size=(mlp, width))
        sd[b + "mlp.fc1.bias"] = rng.normal(size=(mlp,))
        sd[b + "mlp.fc2.weight"] = rng.normal(size=(width, mlp))
        sd[b + "mlp.fc2.bias"] = rng.normal(size=(width,))
    return {k: v.astype(np.float32) for k, v in sd.items()}


def test_eva_converter_structural():
    sd = _fake_timm_eva_sd()
    params = convert_timm_eva_state_dict(sd)

    tower = VisionTransformer(
        image_size=(28, 28), patch_size=(14, 14), width=32, layers=2, heads=4,
        mlp_ratio=2.0, output_dim=16, no_ln_pre=True, proj_bias=True,
        patch_embed_bias=True, norm_eps=1e-6,
    )
    init = tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))["params"]
    a = sorted(str(p) for p, _ in jax.tree_util.tree_leaves_with_path(init))
    b = sorted(str(p) for p, _ in jax.tree_util.tree_leaves_with_path(params))
    assert a == b
    # k-bias section pinned to zero
    bias = params["transformer"]["resblocks_0"]["attn"]["in_proj_bias"]
    np.testing.assert_array_equal(np.asarray(bias[32:64]), 0.0)

    out = tower.apply({"params": params}, jnp.zeros((2, 28, 28, 3)))
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_eva_g14_registry_builds():
    cfg = parse_model_cfg(get_model_config("EVA01-g-14"))
    model = build_model(cfg, remat=True)  # BASELINE config 5: grad ckpt
    var_shapes = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 224, 224, 3)),
                             jnp.zeros((1, 77), jnp.int32)),
        jax.random.PRNGKey(0),
    )
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(var_shapes))
    assert n > 1.1e9  # EVA-g-14 CLIP ≈ 1.14B params
    v = var_shapes["params"]["visual"]
    assert v["proj"]["kernel"].shape == (1408, 1024)  # biased head as proj
    assert "bias" in v["conv1"]
