"""ModifiedResNet tower parity vs the torch reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.models import (
    build_model,
    parse_model_cfg,
)
from refining_clip_via_dinov2_representations_tpu.models.convert import (
    convert_clip_variables,
)
from tests.ref_loader import load_ref, reference_available

torch = pytest.importorskip("torch")

if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)

TINY_RN = {
    "embed_dim": 64,
    "vision_cfg": {
        "image_size": 32, "layers": [1, 1, 1, 1], "width": 16, "head_width": 64,
        "patch_size": None,
    },
    "text_cfg": {"context_length": 16, "vocab_size": 128, "width": 32, "heads": 4, "layers": 2},
}


def test_modified_resnet_parity():
    ref_model_mod = load_ref("model")
    torch.manual_seed(0)
    ref = ref_model_mod.CLIP(
        embed_dim=64,
        vision_cfg=ref_model_mod.CLIPVisionCfg(**TINY_RN["vision_cfg"]),
        text_cfg=ref_model_mod.CLIPTextCfg(**TINY_RN["text_cfg"]),
    )
    ref.eval()

    model = build_model(parse_model_cfg(TINY_RN))
    variables = convert_clip_variables(ref.state_dict())

    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref.encode_image(torch.from_numpy(images)).numpy()
    got = model.apply(variables, jnp.asarray(images), method="encode_image")
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=5e-4)


def test_rn50_config_builds():
    from refining_clip_via_dinov2_representations_tpu.models import get_model_config

    cfg = parse_model_cfg(get_model_config("RN50"))
    model = build_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 77), jnp.int32)
    )
    out = model.apply(variables, jnp.zeros((1, 224, 224, 3)), method="encode_image")
    assert out.shape == (1, 1024)
    assert "batch_stats" in variables
