"""forward_intermediates parity vs the reference tower implementations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.models import (
    build_model,
    convert_clip_state_dict,
    parse_model_cfg,
)
from refining_clip_via_dinov2_representations_tpu.models.intermediates import (
    forward_intermediates,
)
from tests.ref_loader import load_ref, reference_available

torch = pytest.importorskip("torch")
if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)

TINY = dict(
    embed_dim=64,
    vision_cfg=dict(image_size=32, patch_size=8, width=48, layers=3, head_width=24),
    text_cfg=dict(context_length=16, vocab_size=128, width=32, heads=4, layers=3),
)


def test_forward_intermediates_parity():
    ref_model_mod = load_ref("model")
    torch.manual_seed(0)
    ref = ref_model_mod.CLIP(
        embed_dim=64,
        vision_cfg=ref_model_mod.CLIPVisionCfg(**TINY["vision_cfg"]),
        text_cfg=ref_model_mod.CLIPTextCfg(**TINY["text_cfg"]),
    )
    ref.eval()
    model = build_model(parse_model_cfg(TINY))
    variables = {"params": convert_clip_state_dict(ref.state_dict())}

    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    texts = np.zeros((2, 16), np.int64)
    texts[:, 0] = 126
    texts[:, 1:5] = rng.integers(1, 126, (2, 4))
    texts[:, 5] = 127

    with torch.no_grad():
        want = ref.forward_intermediates(
            image=torch.from_numpy(images),
            text=torch.from_numpy(texts),
            image_indices=2,
            text_indices=2,
            image_output_extra_tokens=True,
        )
    got = forward_intermediates(
        model, variables,
        image=jnp.asarray(images), text=jnp.asarray(texts.astype(np.int32)),
        image_indices=2, text_indices=2, image_output_extra_tokens=True,
    )

    assert len(got["image_intermediates"]) == len(want["image_intermediates"]) == 2
    for g, w in zip(got["image_intermediates"], want["image_intermediates"]):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), atol=5e-4, rtol=5e-4)
    for g, w in zip(got["text_intermediates"], want["text_intermediates"]):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(
        np.asarray(got["image_features"]), want["image_features"].numpy(),
        atol=5e-4, rtol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["text_features"]), want["text_features"].numpy(),
        atol=5e-4, rtol=5e-4,
    )
