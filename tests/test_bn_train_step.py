"""BatchNorm towers through the production train step.

The reference trains ResNet/FastViT towers with torch BN semantics: train
mode normalizes with batch statistics and updates running stats every step
(`modified_resnet.py`, torch BN default), `--lock-image-freeze-bn-stats`
freezes them (`utils.py:11-47` FrozenBatchNorm). Here the running stats live
in `TrainState.batch_stats` and thread through the step / accumulation scan.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import refining_clip_via_dinov2_representations_tpu as oc
from refining_clip_via_dinov2_representations_tpu.train.optim import (
    OptimCfg,
    build_optimizer,
)
from refining_clip_via_dinov2_representations_tpu.train.scheduler import cosine_lr
from refining_clip_via_dinov2_representations_tpu.train.step import (
    StepCfg,
    create_train_state,
    make_train_step,
)


def _fresh(seed=0):
    cfg = oc.parse_model_cfg(oc.get_model_config("RN50"))
    cfg = dataclasses.replace(
        cfg, vision_cfg=dataclasses.replace(cfg.vision_cfg, image_size=32)
    )
    model = oc.build_model(cfg)
    rng = jax.random.PRNGKey(seed)
    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32
    )
    txt = jnp.asarray(
        np.random.default_rng(1).integers(1, 49000, size=(2, 77)), jnp.int32
    )
    variables = model.init(rng, img, txt)
    params = {"model": variables["params"]}
    tx, _ = build_optimizer(params, OptimCfg(lr=1e-4), cosine_lr(1e-4, 10, 100))
    state = create_train_state(
        rng, variables["params"], tx, batch_stats=variables["batch_stats"]
    )
    snap = [np.asarray(a).copy() for a in jax.tree_util.tree_leaves(state.batch_stats)]
    return model, tx, state, snap, img, txt


def _stats_equal(snap, state):
    leaves = jax.tree_util.tree_leaves(state.batch_stats)
    return all(np.allclose(a, np.asarray(b)) for a, b in zip(snap, leaves))


def test_bn_stats_update_during_training():
    model, tx, state, snap, img, txt = _fresh()
    step = make_train_step(model, tx, StepCfg(loss_type="clip"))
    state, metrics = step(state, {"images": img, "texts": txt})
    assert np.isfinite(float(metrics["total_loss"]))
    assert not _stats_equal(snap, state), "BN running stats must update"
    # and a second step keeps moving them
    snap2 = [np.asarray(a).copy() for a in jax.tree_util.tree_leaves(state.batch_stats)]
    state, _ = step(state, {"images": img, "texts": txt})
    assert not _stats_equal(snap2, state)


def test_bn_stats_frozen_with_flag():
    model, tx, state, snap, img, txt = _fresh(seed=1)
    step = make_train_step(
        model, tx, StepCfg(loss_type="clip", freeze_bn_stats=True)
    )
    state, metrics = step(state, {"images": img, "texts": txt})
    assert np.isfinite(float(metrics["total_loss"]))
    assert _stats_equal(snap, state), "frozen BN stats must not move"


def test_bn_stats_thread_through_accumulation():
    model, tx, state, snap, img, txt = _fresh(seed=2)
    step = make_train_step(model, tx, StepCfg(loss_type="clip", accum_freq=2))
    batch = {"images": jnp.stack([img, img]), "texts": jnp.stack([txt, txt])}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert not _stats_equal(snap, state)


def test_bn_free_model_unaffected():
    cfg = oc.parse_model_cfg(oc.get_model_config("ViT-B-32"))
    cfg = dataclasses.replace(
        cfg, vision_cfg=dataclasses.replace(cfg.vision_cfg, image_size=32)
    )
    model = oc.build_model(cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((2, 32, 32, 3))
    txt = jnp.zeros((2, 77), jnp.int32)
    variables = model.init(rng, img, txt)
    assert "batch_stats" not in variables
    tx, _ = build_optimizer(
        {"model": variables["params"]}, OptimCfg(lr=1e-4), cosine_lr(1e-4, 10, 100)
    )
    state = create_train_state(rng, variables["params"], tx)
    step = make_train_step(model, tx, StepCfg(loss_type="clip"))
    state, metrics = step(state, {"images": img, "texts": txt})
    assert state.batch_stats is None
    assert np.isfinite(float(metrics["total_loss"]))


def test_resnet_torch_export_roundtrip():
    """flax RN50 params+batch_stats -> torch CLIP layout -> flax again is
    lossless (the interop exporter now covers the ModifiedResNet tower)."""
    from refining_clip_via_dinov2_representations_tpu.models.convert import (
        convert_clip_variables,
        flax_params_to_torch_state_dict,
    )

    cfg = oc.parse_model_cfg(oc.get_model_config("RN50"))
    cfg = dataclasses.replace(
        cfg, vision_cfg=dataclasses.replace(cfg.vision_cfg, image_size=32)
    )
    model = oc.build_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 77), jnp.int32)
    )
    rng = np.random.default_rng(0)
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape), a.dtype), variables
    )
    sd = flax_params_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        batch_stats=jax.tree_util.tree_map(np.asarray, variables["batch_stats"]),
    )
    assert "visual.layer1.0.conv1.weight" in sd
    assert "visual.bn1.running_mean" in sd
    back = convert_clip_variables(sd)
    import chex
    chex.assert_trees_all_close(
        jax.tree_util.tree_map(jnp.asarray, back["params"]),
        variables["params"], atol=1e-6,
    )
    chex.assert_trees_all_close(
        jax.tree_util.tree_map(jnp.asarray, back["batch_stats"]),
        variables["batch_stats"], atol=1e-6,
    )
