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


def test_stem_conv1_padding_matches_torch():
    """Stride-2 stem conv1 must pad symmetrically like torch `padding=1`
    (`modified_resnet.py:100`) — flax 'SAME' pads (0,1) and shifts the whole
    feature grid by one pixel, which the full-model parity test above cannot
    see (an untrained mean-query attnpool is nearly shift-invariant)."""
    import flax.linen as nn
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    w = rng.normal(size=(3, 3, 3, 8)).astype(np.float32)  # HWIO
    x = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)  # NHWC

    conv = nn.Conv(8, (3, 3), strides=(2, 2), use_bias=False,
                   padding=((1, 1), (1, 1)))
    got = conv.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x))

    tw = torch.from_numpy(w).permute(3, 2, 0, 1)  # OIHW
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    want = F.conv2d(tx, tw, stride=2, padding=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    # and the model's stem actually uses that padding
    model = build_model(parse_model_cfg(TINY_RN))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 16), jnp.int32)
    )
    bound = model.bind(variables)
    assert bound.visual.__class__.__name__ == "ModifiedResNet"
