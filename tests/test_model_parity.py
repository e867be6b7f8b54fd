"""Golden-parity: reference torch CLIP → converted flax CLIP, same outputs.

The embedding-fidelity check SURVEY §7 ranks as hard part #1: QuickGELU
exactness, LayerNorm numerics, argmax-EOT pooling, fused-QKV splits, conv
layout permutes. Tolerance 1e-4 in fp32 on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.models import (
    CLIP,
    CLIPTextCfg,
    CLIPVisionCfg,
    build_model,
    convert_clip_state_dict,
    parse_model_cfg,
)
from tests.ref_loader import load_ref, reference_available

if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)

torch = pytest.importorskip("torch")

TINY = dict(
    embed_dim=64,
    vision_cfg=dict(image_size=32, patch_size=8, width=48, layers=2, head_width=24),
    text_cfg=dict(context_length=16, vocab_size=128, width=32, heads=4, layers=2),
)


def _build_pair(cfg_dict, quick_gelu=False, custom_text=False, seed=0):
    ref_model_mod = load_ref("model")
    torch.manual_seed(seed)
    ref_vision = ref_model_mod.CLIPVisionCfg(**cfg_dict["vision_cfg"])
    ref_text = ref_model_mod.CLIPTextCfg(**cfg_dict["text_cfg"])
    cls = ref_model_mod.CustomTextCLIP if custom_text else ref_model_mod.CLIP
    ref = cls(
        embed_dim=cfg_dict["embed_dim"],
        vision_cfg=ref_vision,
        text_cfg=ref_text,
        quick_gelu=quick_gelu,
    )
    ref.eval()

    cfg = parse_model_cfg({**cfg_dict, "quick_gelu": quick_gelu})
    model = build_model(cfg)
    params = convert_clip_state_dict(ref.state_dict())
    return ref, model, {"params": params}


def _rand_batch(cfg_dict, b=3, seed=0):
    rng = np.random.default_rng(seed)
    s = cfg_dict["vision_cfg"]["image_size"]
    images = rng.normal(size=(b, 3, s, s)).astype(np.float32)
    L = cfg_dict["text_cfg"]["context_length"]
    V = cfg_dict["text_cfg"]["vocab_size"]
    # CLIP-style framing: sot, random ids, eot(max id), pad zeros
    texts = np.zeros((b, L), dtype=np.int64)
    for i in range(b):
        n = rng.integers(3, L - 2)
        texts[i, 0] = V - 2
        texts[i, 1 : 1 + n] = rng.integers(1, V - 2, size=n)
        texts[i, 1 + n] = V - 1  # eot = highest id
    return images, texts


@pytest.mark.parametrize("quick_gelu", [False, True], ids=["gelu", "quickgelu"])
@pytest.mark.parametrize("custom_text", [False, True], ids=["sharedns", "customtext"])
def test_clip_forward_parity(quick_gelu, custom_text):
    ref, model, variables = _build_pair(TINY, quick_gelu=quick_gelu, custom_text=custom_text)
    images, texts = _rand_batch(TINY)

    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(images)).numpy()
        ref_txt = ref.encode_text(torch.from_numpy(texts)).numpy()

    jax_img = model.apply(variables, jnp.asarray(images), method="encode_image")
    jax_txt = model.apply(variables, jnp.asarray(texts.astype(np.int32)), method="encode_text")

    np.testing.assert_allclose(np.asarray(jax_img), ref_img, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(jax_txt), ref_txt, atol=2e-4, rtol=2e-4)


def test_full_forward_dict_parity():
    ref, model, variables = _build_pair(TINY)
    images, texts = _rand_batch(TINY)
    with torch.no_grad():
        ref_img, ref_txt, ref_scale = ref(torch.from_numpy(images), torch.from_numpy(texts))
    out = model.apply(variables, jnp.asarray(images), jnp.asarray(texts.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out["image_features"]), ref_img.numpy(), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out["text_features"]), ref_txt.numpy(), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(float(out["logit_scale"]), float(ref_scale), rtol=1e-5)


def test_avg_pool_and_no_ln_pre_parity():
    cfg = dict(
        embed_dim=64,
        vision_cfg=dict(
            image_size=32, patch_size=8, width=48, layers=2, head_width=24,
            pool_type="avg", no_ln_pre=True, final_ln_after_pool=True,
        ),
        text_cfg=dict(context_length=16, vocab_size=128, width=32, heads=4, layers=2),
    )
    ref, model, variables = _build_pair(cfg)
    images, _ = _rand_batch(cfg)
    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(images)).numpy()
    jax_img = model.apply(variables, jnp.asarray(images), method="encode_image")
    np.testing.assert_allclose(np.asarray(jax_img), ref_img, atol=2e-4, rtol=2e-4)


def test_layerscale_parity():
    cfg = dict(
        embed_dim=64,
        vision_cfg=dict(image_size=32, patch_size=8, width=48, layers=2, head_width=24, ls_init_value=0.1),
        text_cfg=dict(context_length=16, vocab_size=128, width=32, heads=4, layers=2, ls_init_value=0.1),
    )
    ref, model, variables = _build_pair(cfg)
    images, texts = _rand_batch(cfg)
    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(images)).numpy()
        ref_txt = ref.encode_text(torch.from_numpy(texts)).numpy()
    jax_img = model.apply(variables, jnp.asarray(images), method="encode_image")
    jax_txt = model.apply(variables, jnp.asarray(texts.astype(np.int32)), method="encode_text")
    np.testing.assert_allclose(np.asarray(jax_img), ref_img, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(jax_txt), ref_txt, atol=2e-4, rtol=2e-4)


def test_vitb32_shapes():
    """Real registry config initializes and runs (shape-only; fp32 CPU)."""
    from refining_clip_via_dinov2_representations_tpu.models import get_model_config

    cfg = parse_model_cfg(get_model_config("ViT-B-32"))
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 224, 224, 3))
    txt = jnp.zeros((1, 77), jnp.int32)
    variables = model.init(rng, img, txt)
    out = model.apply(variables, img, txt)
    assert out["image_features"].shape == (1, 512)
    assert out["text_features"].shape == (1, 512)
