"""Native SigLIP vision tower parity vs HF transformers SiglipVisionModel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from refining_clip_via_dinov2_representations_tpu.models.siglip import (
    SiglipVisionCfg,
    SiglipVisionTower,
    convert_hf_siglip_vision_state_dict,
    parse_siglip_timm_name,
)


def test_parse_timm_names():
    d = parse_siglip_timm_name("vit_base_patch16_siglip_224")
    assert d == {"width": 768, "layers": 12, "heads": 12, "mlp_dim": 3072,
                 "patch_size": 16, "image_size": 224}
    d = parse_siglip_timm_name("vit_so400m_patch14_siglip_384")
    assert d["width"] == 1152 and d["layers"] == 27 and d["mlp_dim"] == 4304
    assert parse_siglip_timm_name("convnext_base") is None


def test_siglip_tower_parity_vs_hf():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
    )
    torch.manual_seed(0)
    hf = SiglipVisionModel(hf_cfg)
    hf.eval()

    tower = SiglipVisionTower(
        cfg=SiglipVisionCfg(width=32, layers=2, heads=4, mlp_dim=64,
                            patch_size=16, image_size=32)
    )
    params = convert_hf_siglip_vision_state_dict(hf.state_dict())

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(x)).pooler_output.numpy()
    got = tower.apply({"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=5e-4)


def test_siglip_registry_model_builds():
    """ViT-B-16-SigLIP from the registry builds natively end to end."""
    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model,
        get_model_config,
        parse_model_cfg,
    )

    cfg = parse_model_cfg(get_model_config("ViT-B-16-SigLIP"))
    model = build_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
        jnp.zeros((1, cfg.text_cfg.context_length), jnp.int32),
    )
    out = model.apply(
        variables, jnp.zeros((1, 224, 224, 3)),
        jnp.zeros((1, cfg.text_cfg.context_length), jnp.int32),
    )
    assert out["image_features"].shape == (1, 1152) or out["image_features"].shape == (1, 768)
    assert "logit_bias" in out  # SigLIP configs set init_logit_bias


def test_timm_export_import_roundtrip():
    """flax SigLIP tower params → timm layout (`visual.trunk.*`) → importer
    gives back the identical tree (torch-interop export coverage)."""
    from refining_clip_via_dinov2_representations_tpu.models.siglip import (
        convert_timm_siglip_vision_state_dict,
        siglip_vision_params_to_timm_state_dict,
    )

    tower = SiglipVisionTower(
        cfg=SiglipVisionCfg(width=32, layers=2, heads=4, mlp_dim=64,
                            patch_size=16, image_size=32)
    )
    variables = tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda a: np.asarray(rng.normal(size=a.shape), np.float32),
        variables["params"],
    )

    sd = siglip_vision_params_to_timm_state_dict(params)
    assert "visual.trunk.blocks.0.attn.qkv.weight" in sd
    assert sd["visual.trunk.attn_pool.latent"].shape == (1, 1, 32)

    back = convert_timm_siglip_vision_state_dict(sd)
    import chex
    chex.assert_trees_all_close(back, params, atol=1e-7)


def test_full_siglip_model_torch_export_roundtrip():
    """Whole-model export (`flax_params_to_torch_state_dict`) of a SigLIP
    CLIP emits hub layout (visual.trunk.* + text.*) and reimports losslessly
    via `convert_clip_variables`."""
    import dataclasses

    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model, get_model_config, parse_model_cfg,
    )
    from refining_clip_via_dinov2_representations_tpu.models.convert import (
        convert_clip_variables,
        flax_params_to_torch_state_dict,
    )

    cfg = parse_model_cfg(get_model_config("ViT-B-16-SigLIP"))
    # shrink towers for test speed: SigLIP dims come from the timm name, so
    # only image size is shrunk here; text stays as configured
    cfg = dataclasses.replace(
        cfg, vision_cfg=dataclasses.replace(cfg.vision_cfg, image_size=32)
    )
    model = build_model(cfg)
    ctx = cfg.text_cfg.context_length
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, ctx), jnp.int32)
    )
    sd = flax_params_to_torch_state_dict(variables["params"])
    assert any(k.startswith("visual.trunk.") for k in sd)
    assert any(k.startswith("text.transformer.") for k in sd)
    assert "logit_bias" in sd

    back = convert_clip_variables(sd)
    import chex
    chex.assert_trees_all_close(
        jax.tree_util.tree_map(np.asarray, back["params"]),
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        atol=1e-6,
    )
