"""Hub-checkpoint trunk-family dispatch (`convert.py:_convert`) and the
timm-layout exporters' roundtrips.

The reference delegates timm-trunk checkpoints to timm itself
(`timm_model.py:23-198` + `factory.py:218-277`); here `_convert` sniffs the
trunk family from its keys and routes to the native converter.
"""

import numpy as np

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.models.convert import (
    convert_clip_variables,
)


def test_dispatch_convnext_trunk():
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
        "visual.trunk.head.norm.weight": np.ones(8),
        "visual.trunk.head.norm.bias": np.zeros(8),
        "visual.head.proj.weight": rng.normal(size=(12, 8)),
        "logit_scale": np.asarray(2.65),
    }
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    out = convert_clip_variables(sd, strict=False)
    vis = out["params"]["visual"]
    assert "stem_conv" in vis and "stage0_block0" in vis and "head_proj" in vis


def test_dispatch_eva01_trunk():
    from tests.test_eva import _fake_timm_eva_sd

    sd = dict(_fake_timm_eva_sd())
    sd["logit_scale"] = np.asarray(2.65, np.float32)
    out = convert_clip_variables(sd, strict=False)
    vis = out["params"]["visual"]
    blk = vis["transformer"]["resblocks_0"]
    assert "in_proj_kernel" in blk["attn"]
    # q/zero-k/v fused bias
    assert blk["attn"]["in_proj_bias"].shape == (96,)
    assert np.all(blk["attn"]["in_proj_bias"][32:64] == 0)


def test_dispatch_eva02_trunk_infers_width():
    from tests.test_eva02 import TINY, _timm_state_dict

    rng = np.random.default_rng(2)
    sd = dict(_timm_state_dict(TINY, fused=True, rng=rng))
    sd["logit_scale"] = np.asarray(2.65, np.float32)
    out = convert_clip_variables(sd, strict=False)  # no cfg: width inferred
    vis = out["params"]["visual"]
    assert "resblocks_0" in vis
    assert "fc1_g" in vis["resblocks_0"]["mlp"] or "fc1" in vis["resblocks_0"]["mlp"]


def test_convnext_timm_export_import_roundtrip():
    from refining_clip_via_dinov2_representations_tpu.models.convnext import (
        ConvNextCfg,
        ConvNextTower,
        convert_timm_convnext_state_dict,
        convnext_params_to_timm_state_dict,
    )

    tower = ConvNextTower(cfg=ConvNextCfg(depths=(1, 1), dims=(8, 16)), output_dim=12)
    variables = tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda a: np.asarray(rng.normal(size=a.shape), np.float32),
        variables["params"],
    )
    sd = convnext_params_to_timm_state_dict(params)
    assert "visual.trunk.stages.1.downsample.1.weight" in sd
    back = convert_timm_convnext_state_dict(sd)
    import chex
    chex.assert_trees_all_close(back, params, atol=1e-7)


def test_eva01_timm_export_import_roundtrip():
    from tests.test_eva import _fake_timm_eva_sd
    from refining_clip_via_dinov2_representations_tpu.models.eva import (
        convert_timm_eva_state_dict,
        eva_params_to_timm_state_dict,
    )

    params = convert_timm_eva_state_dict(_fake_timm_eva_sd())
    sd = eva_params_to_timm_state_dict(params)
    back = convert_timm_eva_state_dict(sd)
    import chex
    chex.assert_trees_all_close(back, params, atol=1e-7)


def test_eva02_timm_export_import_roundtrip():
    from tests.test_eva02 import TINY, _timm_state_dict
    from refining_clip_via_dinov2_representations_tpu.models.eva02 import (
        convert_timm_eva02_state_dict,
        eva02_params_to_timm_state_dict,
    )

    rng = np.random.default_rng(5)
    params = convert_timm_eva02_state_dict(_timm_state_dict(TINY, fused=False, rng=rng), TINY)
    sd = eva02_params_to_timm_state_dict(params)
    assert any(".attn.q_proj.weight" in k for k in sd)
    back = convert_timm_eva02_state_dict(sd, TINY)
    import chex
    # exact: the source came through the split-proj path, so the k-bias
    # slice is already zero (timm k_proj is biasless)
    chex.assert_trees_all_close(back, params, atol=1e-7)


def test_coca_torch_export_roundtrip_vs_reference():
    """torch CoCa sd → flax → export → same tensors under the same keys
    (completing the interop matrix for the multimodal decoder + poolers)."""
    import pytest
    torch = pytest.importorskip("torch")
    from tests.ref_loader import reference_available

    if not reference_available():
        pytest.skip("reference repo not mounted")
    from tests.test_coca import _build_pair
    from refining_clip_via_dinov2_representations_tpu.models.convert import (
        flax_params_to_torch_state_dict,
    )

    ref, _, variables = _build_pair()
    sd = flax_params_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        shared_text_namespace=False,
    )
    ref_sd = {k: v for k, v in ref.state_dict().items() if "attn_mask" not in k}
    assert set(sd) == set(ref_sd), (
        sorted(set(ref_sd) - set(sd))[:8], sorted(set(sd) - set(ref_sd))[:8]
    )
    for k in ref_sd:
        np.testing.assert_allclose(
            sd[k].float().numpy(), ref_sd[k].float().numpy(), atol=1e-6,
            err_msg=k,
        )


def test_fastvit_timm_export_import_roundtrip():
    """timm fastvit sd → flax → export → exactly the original keys/values
    (MobileOne branches, SE, RepMixer, attention stage, BN stats)."""
    from tests.test_fastvit import TINY, _timm_fastvit_state_dict
    from refining_clip_via_dinov2_representations_tpu.models.fastvit import (
        convert_timm_fastvit_state_dict,
        fastvit_params_to_timm_state_dict,
    )

    sd = _timm_fastvit_state_dict(TINY, output_dim=20)
    conv = convert_timm_fastvit_state_dict(sd)
    out = fastvit_params_to_timm_state_dict(conv["params"], conv["batch_stats"])
    assert set(out) == set(sd), (
        sorted(set(sd) - set(out))[:8], sorted(set(out) - set(sd))[:8]
    )
    for k in sd:
        np.testing.assert_allclose(out[k], np.asarray(sd[k], np.float32), atol=1e-7,
                                   err_msg=k)


def test_mci_vit_timm_export_import_roundtrip():
    from tests.test_fastvit import _torchlike
    from refining_clip_via_dinov2_representations_tpu.models.fastvit import (
        convert_timm_mci_vit_state_dict,
        mci_vit_params_to_timm_state_dict,
    )

    t = "visual.trunk."
    sd = {}
    # 2-layer conv stem + 1 transformer block hybrid
    for i in range(2):
        sd[f"{t}patch_embed.backbone.{i}.conv.weight"] = _torchlike((8, 8 if i else 3, 3, 3))
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{t}patch_embed.backbone.{i}.bn.{leaf}"] = _torchlike((8,), positive=leaf == "running_var")
    sd[f"{t}cls_token"] = _torchlike((1, 1, 8))
    sd[f"{t}pos_embed"] = _torchlike((1, 5, 8))
    b = f"{t}blocks.0"
    sd[f"{b}.norm1.weight"] = _torchlike((8,))
    sd[f"{b}.norm1.bias"] = _torchlike((8,))
    sd[f"{b}.norm2.weight"] = _torchlike((8,))
    sd[f"{b}.norm2.bias"] = _torchlike((8,))
    sd[f"{b}.attn.qkv.weight"] = _torchlike((24, 8))
    sd[f"{b}.attn.qkv.bias"] = _torchlike((24,))
    sd[f"{b}.attn.proj.weight"] = _torchlike((8, 8))
    sd[f"{b}.attn.proj.bias"] = _torchlike((8,))
    sd[f"{b}.mlp.fc1.weight"] = _torchlike((32, 8))
    sd[f"{b}.mlp.fc1.bias"] = _torchlike((32,))
    sd[f"{b}.mlp.fc2.weight"] = _torchlike((8, 32))
    sd[f"{b}.mlp.fc2.bias"] = _torchlike((8,))
    sd[f"{t}norm.weight"] = _torchlike((8,))
    sd[f"{t}norm.bias"] = _torchlike((8,))
    sd[f"{t}head.weight"] = _torchlike((16, 8))
    sd[f"{t}head.bias"] = _torchlike((16,))

    conv = convert_timm_mci_vit_state_dict(sd)
    out = mci_vit_params_to_timm_state_dict(conv["params"], conv.get("batch_stats"))
    assert set(out) == set(sd), (
        sorted(set(sd) - set(out))[:8], sorted(set(out) - set(sd))[:8]
    )
    for k in sd:
        np.testing.assert_allclose(out[k], np.asarray(sd[k], np.float32), atol=1e-7,
                                   err_msg=k)


def test_vitamin_timm_export_import_roundtrip():
    from tests.test_vitamin import TINY
    from refining_clip_via_dinov2_representations_tpu.models.vitamin import (
        ViTaminVisionTower,
        convert_timm_vitamin_state_dict,
        vitamin_params_to_timm_state_dict,
    )

    tower = ViTaminVisionTower(cfg=TINY, output_dim=20)
    variables = tower.init(jax.random.PRNGKey(0), jnp.zeros((1, TINY.image_size, TINY.image_size, 3)))
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda a: np.asarray(rng.normal(size=a.shape), np.float32),
        variables["params"],
    )
    sd = vitamin_params_to_timm_state_dict(params)
    assert any("patch_embed.backbone.stages" in k for k in sd)
    back = convert_timm_vitamin_state_dict(sd, TINY)
    import chex
    chex.assert_trees_all_close(back, params, atol=1e-7)


def test_swin_timm_export_import_roundtrip():
    from tests.test_swin import TINY
    from refining_clip_via_dinov2_representations_tpu.models.swin import (
        SwinVisionTower,
        convert_timm_swin_state_dict,
        swin_params_to_timm_state_dict,
    )

    tower = SwinVisionTower(cfg=TINY, output_dim=8)
    variables = tower.init(
        jax.random.PRNGKey(0), jnp.zeros((1, TINY.image_size, TINY.image_size, 3))
    )
    rng = np.random.default_rng(1)
    params = jax.tree_util.tree_map(
        lambda a: np.asarray(rng.normal(size=a.shape), np.float32),
        variables["params"],
    )
    sd = swin_params_to_timm_state_dict(params)
    assert any(".attn.relative_position_bias_table" in k for k in sd)
    back = convert_timm_swin_state_dict(sd, TINY)
    import chex
    chex.assert_trees_all_close(back, params, atol=1e-7)


def test_dispatch_vitamin_trunk_import():
    """ViTamin hub keys route to the ViTamin converter (its
    patch_embed.backbone.stem prefix must win over the MCi backbone sniff)."""
    from refining_clip_via_dinov2_representations_tpu.models.vitamin import (
        vitamin_params_to_timm_state_dict,
        ViTaminVisionTower,
    )
    from tests.test_vitamin import TINY

    tower = ViTaminVisionTower(cfg=TINY, output_dim=20)
    variables = tower.init(
        jax.random.PRNGKey(0), jnp.zeros((1, TINY.image_size, TINY.image_size, 3))
    )
    sd = dict(vitamin_params_to_timm_state_dict(variables["params"]))
    sd["logit_scale"] = np.asarray(2.65, np.float32)
    out = convert_clip_variables(sd, strict=False)
    vis = out["params"]["visual"]
    assert "stem_conv1" in vis and "fc_norm" in vis  # ViTamin tree, not MCi


def test_mesh_specs_vitamin_geglu():
    from jax.sharding import PartitionSpec as P
    from refining_clip_via_dinov2_representations_tpu.parallel.mesh import _param_spec

    def spec(p):
        return _param_spec(tuple(p.split("/")), np.zeros((8, 8)))

    assert spec("visual/resblocks_0/mlp/w0/kernel") == P(None, "model")
    assert spec("visual/resblocks_0/mlp/w1/kernel") == P(None, "model")
    assert spec("visual/resblocks_0/mlp/w2/kernel") == P("model", None)
