"""Swin tower parity vs HF SwinModel (the local numerics oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from refining_clip_via_dinov2_representations_tpu.models.swin import (
    SwinCfg,
    SwinVisionTower,
    convert_hf_swin_state_dict,
    convert_timm_swin_state_dict,
)

TINY = SwinCfg(
    image_size=32, patch_size=4, embed_dim=16, depths=(2, 2), num_heads=(2, 4),
    window_size=2,
)


def _hf_model():
    from transformers import SwinConfig, SwinModel

    torch.manual_seed(0)
    hf = SwinModel(
        SwinConfig(
            image_size=TINY.image_size, patch_size=TINY.patch_size,
            embed_dim=TINY.embed_dim, depths=list(TINY.depths),
            num_heads=list(TINY.num_heads), window_size=TINY.window_size,
            drop_path_rate=0.0, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
    )
    hf.eval()
    return hf


def test_swin_forward_matches_hf():
    hf = _hf_model()
    params = convert_hf_swin_state_dict(hf.state_dict(), TINY)
    tower = SwinVisionTower(cfg=TINY, output_dim=8, output_tokens=True)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, TINY.image_size, TINY.image_size, 3)).astype(np.float32)

    # init to get proj params, then overlay the converted trunk
    variables = tower.init(jax.random.PRNGKey(0), jnp.asarray(img))
    merged = dict(variables["params"])
    for k, v in params.items():
        merged[k] = v
    pooled, tokens = tower.apply({"params": merged}, jnp.asarray(img))

    with torch.no_grad():
        out = hf(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    want_tokens = out.last_hidden_state.numpy()

    np.testing.assert_allclose(
        np.asarray(tokens), want_tokens, atol=2e-4, rtol=2e-4
    )
    # pooled = mean over tokens, then our projection; check the mean part
    np.testing.assert_allclose(
        np.asarray(tokens).mean(1), want_tokens.mean(1), atol=2e-4
    )


def test_swin_timm_layout_converter():
    """timm key layout (visual.trunk.*) maps onto the same param tree."""
    hf = _hf_model()
    sd = hf.state_dict()
    # build a synthetic timm-layout dict from the HF one
    timm_sd = {}
    for k, v in sd.items():
        k2 = None
        if k == "embeddings.patch_embeddings.projection.weight":
            k2 = "patch_embed.proj.weight"
        elif k == "embeddings.patch_embeddings.projection.bias":
            k2 = "patch_embed.proj.bias"
        elif k.startswith("embeddings.norm."):
            k2 = k.replace("embeddings.norm.", "patch_embed.norm.")
        elif k.startswith("layernorm."):
            k2 = k.replace("layernorm.", "norm.")
        elif ".blocks." in k:
            k2 = (
                k.replace("encoder.layers.", "layers.")
                .replace("layernorm_before", "norm1")
                .replace("layernorm_after", "norm2")
                .replace("attention.output.dense", "attn.proj")
                .replace("attention.self.relative_position_bias_table",
                         "attn.relative_position_bias_table")
                .replace("attention.self.relative_position_index",
                         "attn.relative_position_index")
                .replace("intermediate.dense", "mlp.fc1")
                .replace("output.dense", "mlp.fc2")
            )
            if "attention.self" in k2:
                continue  # q/k/v fused below
        elif ".downsample." in k:
            k2 = k.replace("encoder.layers.", "layers.")
        elif k.startswith("pooler"):
            continue
        if k2:
            timm_sd["visual.trunk." + k2] = v
    # fuse q/k/v into timm's qkv
    import re

    for k in list(sd.keys()):
        m = re.match(r"encoder\.layers\.(\d+)\.blocks\.(\d+)\.attention\.self\.query\.(weight|bias)", k)
        if m:
            si, bi, leaf = m.groups()
            q = sd[k]
            kk = sd[k.replace("query", "key")]
            v = sd[k.replace("query", "value")]
            timm_sd[f"visual.trunk.layers.{si}.blocks.{bi}.attn.qkv.{leaf}"] = torch.cat([q, kk, v], dim=0)

    p_timm = convert_timm_swin_state_dict(timm_sd, TINY)
    p_hf = convert_hf_swin_state_dict(sd, TINY)
    a = jax.tree_util.tree_leaves_with_path(p_hf)
    b_flat = {tuple(str(x) for x in path): leaf for path, leaf in jax.tree_util.tree_leaves_with_path(p_timm)}
    assert len(a) == len(b_flat)
    for path, leaf in a:
        key = tuple(str(x) for x in path)
        np.testing.assert_allclose(leaf, b_flat[key], atol=1e-6, err_msg=str(key))


def test_create_model_swin():
    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model,
        get_model_config,
        parse_model_cfg,
    )

    cfg = parse_model_cfg(get_model_config("swin_base_patch4_window7_224"))
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 224, 224, 3))
    txt = jnp.zeros((1, 77), jnp.int32)
    variables = model.init(rng, img, txt)
    out = model.apply(variables, img, txt)
    assert out["image_features"].shape == (1, 640)
