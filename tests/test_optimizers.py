"""--opt optimizer zoo: the reference accepts 'adamw' or any timm optimizer
as 'timm/{name}' (`params.py:742-746`); here that surface is optax-backed
(adamw / lion / lamb / adafactor / sgd). These tests prove each family
builds through the full grouped `build_optimizer` path, optimizes, respects
tower locking, and that adafactor's second moment really is factored."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from refining_clip_via_dinov2_representations_tpu.train.optim import (
    OptimCfg,
    build_optimizer,
    build_fused_optimizer,
    make_inner_optimizer,
)
from refining_clip_via_dinov2_representations_tpu.train.scheduler import const_lr


def _toy_params():
    # Mimic the train tree shape: model/{visual,text}/... with one big
    # 2-D kernel so factoring is observable.
    k = jax.random.PRNGKey(0)
    return {
        "model": {
            "visual": {"transformer": {"resblocks_0": {"mlp": {"c_fc": {
                "kernel": jax.random.normal(k, (256, 1024)) * 0.02,
                "bias": jnp.zeros((1024,)),
            }}}}},
            "text": {"transformer": {"resblocks_0": {"attn": {"out_proj": {
                "kernel": jax.random.normal(k, (64, 64)) * 0.02,
            }}}}},
            "logit_scale": jnp.asarray(2.659),
        }
    }


def _loss(params):
    leaves = jax.tree_util.tree_leaves(params)
    return sum(jnp.sum(jnp.square(l - 0.1)) for l in leaves)


@pytest.mark.parametrize(
    "opt", ["adamw", "lion", "lamb", "adafactor", "sgd", "timm/lion"]
)
def test_every_opt_family_builds_and_descends(opt):
    params = _toy_params()
    cfg = OptimCfg(opt=opt, lr=1e-2)
    tx, labels = build_optimizer(params, cfg, const_lr(1e-2, 0, 100))
    state = tx.init(params)
    l0 = _loss(params)
    for _ in range(5):
        grads = jax.grad(_loss)(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    l1 = _loss(params)
    assert np.isfinite(float(l1))
    assert float(l1) < float(l0), f"{opt} did not descend: {l0} -> {l1}"


def test_unknown_opt_raises():
    params = _toy_params()
    with pytest.raises(ValueError, match="unknown --opt"):
        build_optimizer(params, OptimCfg(opt="frobnicator"), const_lr(1e-3, 0, 100))


def test_fused_path_rejects_non_adamw():
    params = _toy_params()
    with pytest.raises(ValueError, match="AdamW only"):
        build_fused_optimizer(params, OptimCfg(opt="lion"), const_lr(1e-3, 0, 100))


def _state_bytes(state):
    return sum(
        l.size * l.dtype.itemsize
        for l in jax.tree_util.tree_leaves(state)
        if hasattr(l, "size")
    )


def test_adafactor_second_moment_is_factored():
    """adafactor's state must be ~1 params-worth (momentum) + O(n+m)
    factored vectors; AdamW's is 2 params-worth. This is the memory claim
    behind using it for giant single-chip configs."""
    params = _toy_params()
    p_bytes = _state_bytes(params)

    tx_af, _ = build_optimizer(params, OptimCfg(opt="adafactor", lr=1e-3), const_lr(1e-3, 0, 100))
    tx_aw, _ = build_optimizer(params, OptimCfg(opt="adamw", lr=1e-3), const_lr(1e-3, 0, 100))
    af_bytes = _state_bytes(tx_af.init(params))
    aw_bytes = _state_bytes(tx_aw.init(params))
    assert aw_bytes > 1.9 * p_bytes  # m + v, both full-shape
    assert af_bytes < 1.2 * p_bytes  # momentum + tiny row/col vectors
    # bf16 momentum halves the remaining big leaf
    tx_bf, _ = build_optimizer(
        params, OptimCfg(opt="adafactor", lr=1e-3, mu_dtype="bfloat16"), const_lr(1e-3, 0, 100)
    )
    assert _state_bytes(tx_bf.init(params)) < 0.7 * p_bytes


def test_locking_freezes_under_every_family():
    params = _toy_params()
    for opt in ("lion", "adafactor"):
        cfg = OptimCfg(opt=opt, lr=1e-2, lock_image=True)
        tx, _ = build_optimizer(params, cfg, const_lr(1e-2, 0, 100))
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        vis = updates["model"]["visual"]
        assert all(
            float(jnp.abs(l).max()) == 0.0 for l in jax.tree_util.tree_leaves(vis)
        ), f"{opt}: locked visual tower received non-zero updates"
        txt = updates["model"]["text"]
        assert any(
            float(jnp.abs(l).max()) > 0.0 for l in jax.tree_util.tree_leaves(txt)
        ), f"{opt}: unlocked text tower got no update"


def test_group_lr_ratios_apply_to_non_adamw():
    """logit_scale group runs at logit_scale_lr; with sgd (update = -lr*g
    exactly, modulo wd) the ratio is directly observable."""
    params = _toy_params()
    cfg = OptimCfg(opt="sgd", lr=1e-2, logit_scale_lr=1e-6, beta1=0.0, wd=0.0)
    tx, _ = build_optimizer(params, cfg, const_lr(1e-2, 0, 100))
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    ls = float(updates["model"]["logit_scale"])
    kern = float(
        updates["model"]["visual"]["transformer"]["resblocks_0"]["mlp"]["c_fc"]["kernel"][0, 0]
    )
    assert np.isclose(ls, -1e-6, rtol=1e-4)
    assert np.isclose(kern, -1e-2, rtol=1e-4)


def test_adafactor_weight_decay_is_lr_scaled():
    """Regression: optax.adafactor's own weight_decay_rate applies RAW
    (after lr scaling) — p -= wd*p per step would be catastrophic at
    wd=0.2. Our chain must produce AdamW-style decoupled decay
    update = -lr*wd*p (observable exactly with zero grads)."""
    lr, wd = 1e-3, 0.2
    tx = make_inner_optimizer(OptimCfg(opt="adafactor", beta1=0.9), lr, wd)
    p = {"w": jnp.full((64, 64), 3.0)}
    state = tx.init(p)
    updates, _ = tx.update(jax.tree.map(jnp.zeros_like, p), state, p)
    got = float(updates["w"][0, 0])
    assert np.isclose(got, -lr * wd * 3.0, rtol=1e-5), (
        f"decay per step {got} != -lr*wd*p {-lr * wd * 3.0} "
        "(raw decay would be -0.6)"
    )


def test_make_inner_optimizer_timm_prefix_maps():
    a = make_inner_optimizer(OptimCfg(opt="timm/adafactor"), 1e-3, 0.0)
    b = make_inner_optimizer(OptimCfg(opt="adafactor"), 1e-3, 0.0)
    p = {"w": jnp.ones((8, 8))}
    sa, sb = a.init(p), b.init(p)
    assert jax.tree_util.tree_structure(sa) == jax.tree_util.tree_structure(sb)
