"""open_clip-API compatibility layer: class-based losses (`losses/compat.py`),
`create_loss` dispatch (`factory.py:506-588`), and top-level re-exports —
a reference user's imports must resolve and the class adapters must equal
the functional losses they wrap."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import refining_clip_via_dinov2_representations_tpu as oc
from refining_clip_via_dinov2_representations_tpu.losses import (
    ClipLoss,
    ClipLossWithDINOEnhancements,
    CoCaLoss,
    CyCLIPLoss,
    DinoLossCfg,
    DistillClipLoss,
    SigLipLoss,
    clip_loss,
    coca_loss,
    create_loss,
    cyclip_loss,
    dino_enhanced_loss,
    distill_clip_loss,
    siglip_loss,
)

B, D = 8, 16


def _feats(seed, d=D):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, d)).astype(np.float32)
    return jnp.asarray(x / np.linalg.norm(x, axis=-1, keepdims=True))


IMG, TXT = _feats(0), _feats(1)
SCALE = jnp.asarray(50.0)


def test_reference_public_symbols_resolve_at_top_level():
    for name in [
        "ClipLoss", "CoCa", "CoCaLoss", "CustomTextCLIP", "DistillClipLoss",
        "SigLipLoss", "CyCLIPLoss", "ClipLossWithDINOEnhancements",
        "IMAGENET_CLASSNAMES", "OPENAI_IMAGENET_TEMPLATES",
        "SIMPLE_IMAGENET_TEMPLATES", "build_zero_shot_classifier",
        "build_zero_shot_classifier_legacy", "create_loss",
        "list_pretrained_models_by_tag", "list_pretrained_tags_by_model",
        "push_pretrained_to_hf_hub", "push_to_hf_hub",
    ]:
        assert hasattr(oc, name), name
    # CustomTextCLIP is the same flax module as CLIP (one class covers both
    # torch layouts — models/clip.py docstring)
    assert oc.CustomTextCLIP is oc.CLIP


def test_clip_loss_class_matches_functional():
    loss = ClipLoss()(IMG, TXT, SCALE)
    assert float(loss) == pytest.approx(
        float(clip_loss(IMG, TXT, SCALE)), rel=1e-6
    )
    d = ClipLoss()(IMG, TXT, SCALE, output_dict=True)
    assert set(d) == {"contrastive_loss"}


def test_siglip_loss_class_matches_functional():
    bias = jnp.asarray(-10.0)
    loss = SigLipLoss()(IMG, TXT, SCALE, bias)
    assert float(loss) == pytest.approx(
        float(siglip_loss(IMG, TXT, SCALE, bias)), rel=1e-6
    )


def test_coca_loss_class_matches_functional():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(B, 6, 32)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, 32, size=(B, 6)), jnp.int32)
    c, cap = CoCaLoss(caption_loss_weight=2.0, clip_loss_weight=1.0)(
        IMG, TXT, logits, labels, SCALE
    )
    ref = coca_loss(IMG, TXT, logits, labels, SCALE)
    assert float(c) == pytest.approx(float(ref["contrastive_loss"]), rel=1e-6)
    assert float(cap) == pytest.approx(float(ref["caption_loss"]), rel=1e-6)


def test_distill_loss_class_matches_functional():
    ti, tt = _feats(3), _feats(4)
    c, dist = DistillClipLoss()(IMG, TXT, SCALE, ti, tt, SCALE)
    ref = distill_clip_loss(IMG, TXT, SCALE, ti, tt, SCALE)
    assert float(c) == pytest.approx(float(ref["contrastive_loss"]), rel=1e-6)
    assert float(dist) == pytest.approx(float(ref["distill_loss"]), rel=1e-6)


def test_cyclip_loss_class_matches_functional():
    total = CyCLIPLoss()(IMG, TXT, SCALE)
    ref = cyclip_loss(IMG, TXT, SCALE)
    assert float(total) == pytest.approx(float(ref["total_loss"]), rel=1e-6)
    d = CyCLIPLoss()(IMG, TXT, SCALE, output_dict=True)
    assert d["lambda_inmodal"] == 0.25 and "inmodal_cyclic" in d


def test_dino_class_matches_functional_and_keeps_none_quirk():
    dino = _feats(5, d=24)
    cfg = DinoLossCfg(lambda_soft=0.7, use_projection=False)
    out = ClipLossWithDINOEnhancements(cfg=cfg)(
        IMG, TXT, SCALE, dino_features=dino, output_dict=True
    )
    ref = dino_enhanced_loss(IMG, TXT, SCALE, dino, cfg)
    assert float(out["total_loss"]) == pytest.approx(
        float(ref["total_loss"]), rel=1e-6
    )
    # reference quirk: no output_dict -> forward returns None (loss.py:597-607)
    assert ClipLossWithDINOEnhancements(cfg=cfg)(
        IMG, TXT, SCALE, dino_features=dino
    ) is None


def test_dino_class_use_projection_requires_image_proj():
    with pytest.raises(ValueError, match="image_proj"):
        ClipLossWithDINOEnhancements(cfg=DinoLossCfg(use_projection=True))(
            IMG, TXT, SCALE, dino_features=_feats(6, d=24), output_dict=True
        )


def test_distributed_torch_knobs_are_validated_not_emulated():
    with pytest.raises(ValueError, match="horovod"):
        ClipLoss(use_horovod=True)
    with pytest.raises(ValueError, match="axis_name"):
        ClipLoss(world_size=8)


def test_create_loss_dispatch_matches_reference_order():
    def args(**kw):
        ns = argparse.Namespace(
            distill=False, model="ViT-B-32", use_coca=False, siglip=False,
            use_CyClip=False, use_dino_general=False, local_loss=False,
            world_size=1, axis_name=None,
        )
        for k, v in kw.items():
            setattr(ns, k, v)
        return ns

    assert isinstance(create_loss(args()), ClipLoss)
    assert isinstance(create_loss(args(distill=True)), DistillClipLoss)
    assert isinstance(create_loss(args(model="coca_ViT-B-32")), CoCaLoss)
    assert isinstance(create_loss(args(siglip=True)), SigLipLoss)
    assert isinstance(create_loss(args(use_CyClip=True)), CyCLIPLoss)
    dl = create_loss(args(use_dino_general=True, lambda_soft=0.9,
                          use_projection=False))
    assert isinstance(dl, ClipLossWithDINOEnhancements)
    assert dl.cfg.lambda_soft == 0.9  # CLI knobs land in the cfg
