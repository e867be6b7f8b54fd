"""DINOv2 teacher parity vs HF transformers (random weights, no downloads)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from refining_clip_via_dinov2_representations_tpu.models.dinov2 import (
    Dinov2,
    Dinov2Cfg,
    convert_dinov2_state_dict,
)
from refining_clip_via_dinov2_representations_tpu.train.dino_teacher import (
    LiveDinoTeacher,
    compute_pairwise_similarities,
    create_soft_labels,
    compute_soft_label_loss,
    renormalize_clip_to_imagenet,
)


def _tiny_pair(use_swiglu=False, image_size=28):
    from transformers import Dinov2Config, Dinov2Model

    hf_cfg = Dinov2Config(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        mlp_ratio=2,
        patch_size=14,
        image_size=image_size,
        use_swiglu_ffn=use_swiglu,
    )
    torch.manual_seed(0)
    hf = Dinov2Model(hf_cfg)
    hf.eval()

    cfg = Dinov2Cfg(
        hidden_size=32, layers=2, heads=4, mlp_ratio=2, patch_size=14,
        use_swiglu_ffn=use_swiglu, native_image_size=image_size,
    )
    model = Dinov2(cfg=cfg)
    params = convert_dinov2_state_dict(hf.state_dict())
    return hf, model, {"params": params}


@pytest.mark.parametrize("use_swiglu", [False, True], ids=["gelu-mlp", "swiglu"])
def test_dinov2_cls_parity(use_swiglu):
    hf, model, variables = _tiny_pair(use_swiglu=use_swiglu)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(x)).last_hidden_state[:, 0, :].numpy()
    got = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_dinov2_pos_embed_interpolation():
    """Off-native resolution runs via bicubic pos-embed interpolation."""
    _, model, variables = _tiny_pair()
    x = jnp.zeros((1, 56, 56, 3))
    out = model.apply(variables, x)
    assert out.shape == (1, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_soft_label_helpers_parity():
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    feats = rng.normal(size=(6, 8)).astype(np.float32)
    sims = compute_pairwise_similarities(jnp.asarray(feats))
    t_norm = F.normalize(torch.from_numpy(feats), dim=1)
    t_sims = (t_norm @ t_norm.T).numpy()
    np.testing.assert_allclose(np.asarray(sims), t_sims, atol=1e-6)

    q = create_soft_labels(sims, temperature=0.02)
    t_q = F.softmax(torch.from_numpy(t_sims) / 0.02, dim=1).numpy()
    np.testing.assert_allclose(np.asarray(q), t_q, atol=1e-5)

    pred = rng.normal(size=(6, 6)).astype(np.float32)
    loss = compute_soft_label_loss(jnp.asarray(pred), q)
    t_loss = F.kl_div(
        F.log_softmax(torch.from_numpy(pred), dim=1), torch.from_numpy(t_q),
        reduction="batchmean",
    ).item()
    assert abs(float(loss) - t_loss) < 1e-5


def test_live_teacher_wrapper():
    _, model, variables = _tiny_pair()
    teacher = LiveDinoTeacher(model, variables)
    # CLIP-normalized input renormalized + gradient-stopped
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 28, 28, 3)), jnp.float32)
    feats = teacher.extract(imgs)
    assert feats.shape == (2, 32)

    def loss(images):
        return jnp.sum(teacher.extract(images) ** 2)

    g = jax.grad(loss)(imgs)
    assert float(jnp.abs(g).max()) == 0.0  # stop_gradient through the teacher


def test_renormalize_roundtrip():
    from refining_clip_via_dinov2_representations_tpu.constants import (
        OPENAI_DATASET_MEAN,
        OPENAI_DATASET_STD,
    )

    raw = np.random.default_rng(0).uniform(size=(2, 4, 4, 3)).astype(np.float32)
    clip_norm = (raw - np.asarray(OPENAI_DATASET_MEAN, np.float32)) / np.asarray(
        OPENAI_DATASET_STD, np.float32
    )
    img_norm = renormalize_clip_to_imagenet(jnp.asarray(clip_norm))
    want = (raw - np.asarray((0.485, 0.456, 0.406), np.float32)) / np.asarray(
        (0.229, 0.224, 0.225), np.float32
    )
    np.testing.assert_allclose(np.asarray(img_norm), want, atol=1e-5)
