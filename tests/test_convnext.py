"""Native ConvNeXt tower parity vs HF transformers ConvNextModel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from refining_clip_via_dinov2_representations_tpu.models.convnext import (
    ConvNextCfg,
    ConvNextTower,
    convert_hf_convnext_state_dict,
)


def test_convnext_trunk_parity_vs_hf():
    from transformers import ConvNextConfig, ConvNextModel

    hf_cfg = ConvNextConfig(
        num_channels=3, hidden_sizes=[8, 16, 32, 64], depths=[1, 1, 2, 1],
        image_size=32,
    )
    torch.manual_seed(0)
    hf = ConvNextModel(hf_cfg)
    hf.eval()

    tower = ConvNextTower(
        cfg=ConvNextCfg(depths=(1, 1, 2, 1), dims=(8, 16, 32, 64)),
        output_dim=64,
    )
    params = convert_hf_convnext_state_dict(hf.state_dict())
    # HF has no projection layer; add an identity so apply works
    params["head_proj"] = {"kernel": np.eye(64, dtype=np.float32)}

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(x)).pooler_output.numpy()
    got = tower.apply({"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=5e-4)


def test_convnext_registry_model_builds():
    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model,
        get_model_config,
        parse_model_cfg,
    )

    cfg = parse_model_cfg(get_model_config("convnext_base_w"))
    model = build_model(cfg)
    img = jnp.zeros((1, 256, 256, 3))
    txt = jnp.zeros((1, 77), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, txt)
    out = model.apply(variables, img, txt)
    assert out["image_features"].shape == (1, 640)


def test_timm_convnext_converter_shapes():
    """timm-layout keys map onto the tower's param tree structurally."""
    from refining_clip_via_dinov2_representations_tpu.models.convnext import (
        convert_timm_convnext_state_dict,
    )

    rng = np.random.default_rng(0)
    sd = {
        "visual.trunk.stem.0.weight": rng.normal(size=(8, 3, 4, 4)),
        "visual.trunk.stem.0.bias": rng.normal(size=(8,)),
        "visual.trunk.stem.1.weight": np.ones(8),
        "visual.trunk.stem.1.bias": np.zeros(8),
        "visual.trunk.stages.0.blocks.0.conv_dw.weight": rng.normal(size=(8, 1, 7, 7)),
        "visual.trunk.stages.0.blocks.0.conv_dw.bias": rng.normal(size=(8,)),
        "visual.trunk.stages.0.blocks.0.norm.weight": np.ones(8),
        "visual.trunk.stages.0.blocks.0.norm.bias": np.zeros(8),
        "visual.trunk.stages.0.blocks.0.mlp.fc1.weight": rng.normal(size=(32, 8)),
        "visual.trunk.stages.0.blocks.0.mlp.fc1.bias": rng.normal(size=(32,)),
        "visual.trunk.stages.0.blocks.0.mlp.fc2.weight": rng.normal(size=(8, 32)),
        "visual.trunk.stages.0.blocks.0.mlp.fc2.bias": rng.normal(size=(8,)),
        "visual.trunk.stages.0.blocks.0.gamma": np.full(8, 1e-6),
        "visual.trunk.stages.1.downsample.0.weight": np.ones(8),
        "visual.trunk.stages.1.downsample.0.bias": np.zeros(8),
        "visual.trunk.stages.1.downsample.1.weight": rng.normal(size=(16, 8, 2, 2)),
        "visual.trunk.stages.1.downsample.1.bias": rng.normal(size=(16,)),
        "visual.trunk.stages.1.blocks.0.conv_dw.weight": rng.normal(size=(16, 1, 7, 7)),
        "visual.trunk.stages.1.blocks.0.conv_dw.bias": rng.normal(size=(16,)),
        "visual.trunk.stages.1.blocks.0.norm.weight": np.ones(16),
        "visual.trunk.stages.1.blocks.0.norm.bias": np.zeros(16),
        "visual.trunk.stages.1.blocks.0.mlp.fc1.weight": rng.normal(size=(64, 16)),
        "visual.trunk.stages.1.blocks.0.mlp.fc1.bias": rng.normal(size=(64,)),
        "visual.trunk.stages.1.blocks.0.mlp.fc2.weight": rng.normal(size=(16, 64)),
        "visual.trunk.stages.1.blocks.0.mlp.fc2.bias": rng.normal(size=(16,)),
        "visual.trunk.stages.1.blocks.0.gamma": np.full(16, 1e-6),
        "visual.trunk.head.norm.weight": np.ones(16),
        "visual.trunk.head.norm.bias": np.zeros(16),
        "visual.head.proj.weight": rng.normal(size=(12, 16)),
    }
    params = convert_timm_convnext_state_dict(sd)

    tower = ConvNextTower(
        cfg=ConvNextCfg(depths=(1, 1), dims=(8, 16)), output_dim=12
    )
    init = tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    a = sorted(str(p) for p, _ in jax.tree_util.tree_leaves_with_path(init))
    b = sorted(str(p) for p, _ in jax.tree_util.tree_leaves_with_path(params))
    assert a == b
    out = tower.apply({"params": params}, jnp.zeros((1, 16, 16, 3)))
    assert out.shape == (1, 12)


def test_convnext_mlp_proj_config_builds():
    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model,
        get_model_config,
        parse_model_cfg,
    )

    cfg = parse_model_cfg(get_model_config("convnext_large_d"))
    model = build_model(cfg)
    img = jnp.zeros((1, 256, 256, 3))
    txt = jnp.zeros((1, 77), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, txt)
    assert "head_mlp_fc1" in variables["params"]["visual"]
    out = model.apply(variables, img, txt)
    assert out["image_features"].shape == (1, cfg.embed_dim)
