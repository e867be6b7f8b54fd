"""The PRODUCTION train step's distributed loss semantics (VERDICT weak #3).

The loss section of the train step runs under shard_map over the data axis,
so the executed path has exactly the reference's per-rank semantics
(`/root/reference/src/open_clip/loss.py:350-477` operates on the local
batch):

* classic CLIP term: local rows x all-gathered cols (local_loss), whose
  device-mean equals the global-batch CE;
* DINO soft-KL / text-KL: LOCAL per-device b x b similarity blocks — NOT a
  global B x B matrix;
* SigLIP: the configured dist impl (shift/bidir/gather/reduce rings) — all
  equivalent to the global pairwise loss.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from refining_clip_via_dinov2_representations_tpu.losses import DinoLossCfg
from refining_clip_via_dinov2_representations_tpu.losses.contrastive import (
    clip_loss,
    siglip_loss,
)
from refining_clip_via_dinov2_representations_tpu.losses.dino import (
    DinoProjectionHead,
    dino_enhanced_loss,
)
from refining_clip_via_dinov2_representations_tpu.models import (
    build_model,
    parse_model_cfg,
)
from refining_clip_via_dinov2_representations_tpu.parallel.mesh import (
    create_mesh,
    param_shardings,
    replicated,
    shard_batch,
)
from refining_clip_via_dinov2_representations_tpu.train.optim import (
    OptimCfg,
    build_optimizer,
)
from refining_clip_via_dinov2_representations_tpu.train.scheduler import const_lr
from refining_clip_via_dinov2_representations_tpu.train.step import (
    StepCfg,
    create_train_state,
    make_train_step,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

TINY_CFG = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 16, "patch_size": 8, "width": 32, "layers": 2, "head_width": 16},
    "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 4, "layers": 2},
}
B = 32  # global batch; 8-way mesh -> local blocks of 4
DINO_DIM = 24


def _make(loss_type, mesh, dino=None, siglip_impl="shift", opt="adamw"):
    model = build_model(parse_model_cfg(TINY_CFG))
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((2, 16, 16, 3)), jnp.zeros((2, 12), jnp.int32))
    head = head_params = None
    if loss_type == "dino":
        head = DinoProjectionHead(dino_dim=DINO_DIM, projection_type="mlp")
        head_params = head.init(rng, jnp.zeros((2, 32)))["params"]
    params = {"model": variables["params"]}
    if head_params is not None:
        params["dino_head"] = head_params
    tx, _ = build_optimizer(params, OptimCfg(opt=opt, lr=1e-3), const_lr(1e-3, 0, 100))
    state = create_train_state(rng, variables["params"], tx, head_params)
    cfg = StepCfg(
        loss_type=loss_type,
        dino=dino or DinoLossCfg(),
        siglip_dist_impl=siglip_impl,
    )
    step_fn = make_train_step(model, tx, cfg, head=head, mesh=mesh)
    return model, head, state, step_fn


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": jnp.asarray(rng.normal(size=(B, 16, 16, 3)), jnp.float32),
        "texts": jnp.asarray(
            np.concatenate(
                [np.full((B, 1), 62), rng.integers(1, 62, size=(B, 10)), np.full((B, 1), 63)],
                axis=1,
            ),
            jnp.int32,
        ),
        "dino_features": jnp.asarray(rng.normal(size=(B, DINO_DIM)), jnp.float32),
    }


def _run_step(mesh, state, step_fn, batch, shard_params=False):
    with jax.set_mesh(mesh):
        if shard_params:
            shardings = param_shardings(state.params, mesh)
            state = state.replace(
                params=jax.tree.map(jax.device_put, state.params, shardings)
            )
        else:
            state = jax.device_put(state, replicated(mesh))
        sharded = shard_batch(batch, mesh)
        _, metrics = step_fn(state, sharded)
        return {k: float(v) for k, v in metrics.items()}


DINO_CFG = DinoLossCfg(
    lambda_soft=1.0, lambda_weighted=0.3, soft_dino_to_text=True,
    weight_text_symmetry=True,
)


def test_dino_step_uses_local_blocks_for_soft_kl():
    """soft_loss from the 8-device step == mean over the 8 local blocks of
    the single-device soft computation — and != the global-batch value."""
    mesh = create_mesh(data=8, model=1)
    model, head, state, step_fn = _make("dino", mesh, dino=DINO_CFG)
    batch = _batch()
    params0 = jax.tree.map(np.asarray, state.params)  # step donates the state
    metrics = _run_step(mesh, state, step_fn, batch)

    # recompute features on one device with the same (pre-update) params
    out = model.apply({"params": params0["model"]}, batch["images"], batch["texts"])
    img_f, txt_f = out["image_features"], out["text_features"]
    scale = out["logit_scale"]
    raw_proj = head.apply({"params": params0["dino_head"]}, img_f)

    n = 8
    bl = B // n
    per_block_soft = []
    for i in range(n):
        sl = slice(i * bl, (i + 1) * bl)
        losses = dino_enhanced_loss(
            img_f[sl], txt_f[sl], scale, batch["dino_features"][sl], DINO_CFG,
            image_proj=raw_proj[sl],
        )
        per_block_soft.append(float(losses["soft_loss"]))
    expected_soft = float(np.mean(per_block_soft))
    assert metrics["soft_loss"] == pytest.approx(expected_soft, rel=1e-4), (
        metrics["soft_loss"], expected_soft,
    )

    global_soft = float(
        dino_enhanced_loss(
            img_f, txt_f, scale, batch["dino_features"], DINO_CFG,
            image_proj=raw_proj,
        )["soft_loss"]
    )
    assert metrics["soft_loss"] != pytest.approx(global_soft, rel=1e-3), (
        "distributed soft-KL must use LOCAL blocks, not the global batch"
    )

    # classic term: mean of per-rank local-row CEs == global CE
    expected_classic = float(clip_loss(img_f, txt_f, scale))
    assert metrics["classic_loss"] == pytest.approx(expected_classic, rel=1e-4)


def test_dino_step_model_axis_is_semantically_neutral():
    """4x2 (TP) and 4x1 meshes give the same loss: the model axis shards
    weights, never the loss math."""
    mesh42 = create_mesh(data=4, model=2)
    mesh41 = create_mesh(data=4, model=1, devices=jax.devices()[:4])
    model, head, state, step42 = _make("dino", mesh42, dino=DINO_CFG)
    _, _, state41, step41 = _make("dino", mesh41, dino=DINO_CFG)
    batch = _batch()
    m42 = _run_step(mesh42, state, step42, batch, shard_params=True)
    m41 = _run_step(mesh41, state41, step41, batch)
    for k in ("total_loss", "classic_loss", "soft_loss", "weighted_loss"):
        assert m42[k] == pytest.approx(m41[k], rel=2e-4), (k, m42[k], m41[k])


@pytest.mark.parametrize("impl", ["shift", "bidir", "gather", "reduce"])
def test_siglip_step_dist_impls_match_global(impl):
    """All four dist impls (reference loss.py:673-756) produce the global
    pairwise loss, reachable from the production step via StepCfg."""
    mesh = create_mesh(data=8, model=1)
    model, _, state, step_fn = _make("siglip", mesh, siglip_impl=impl)
    batch = {k: v for k, v in _batch().items() if k != "dino_features"}
    params0 = jax.tree.map(np.asarray, state.params)
    metrics = _run_step(mesh, state, step_fn, batch)

    out = model.apply(
        {"params": params0["model"]}, batch["images"], batch["texts"]
    )
    expected = float(
        siglip_loss(
            out["image_features"], out["text_features"], out["logit_scale"], 0.0
        )
    )
    assert metrics["contrastive_loss"] == pytest.approx(expected, rel=1e-4), impl


def test_accum_under_mesh_matches_single_big_batch_clip():
    """Cached-feature accumulation (upstream `trial.py:311-360` semantics):
    a 2x-accum step over a mesh reproduces ONE full-batch step — same loss
    (every InfoNCE row sees all B negatives) and near-identical parameters
    (feature-pathway gradients sum exactly to the full-batch gradient;
    logit_scale accumulates accum x its gradient, torch-faithful, which at
    lr 1e-3 moves Adam's update negligibly for one step)."""
    mesh = create_mesh(data=4, model=1, devices=jax.devices()[:4])
    model, _, state, step2 = _make_accum("clip", mesh, accum=2)
    _, _, state1, step1 = _make_accum("clip", mesh, accum=1)
    batch = _batch(seed=5)
    b = {k: v for k, v in batch.items() if k != "dino_features"}

    with jax.set_mesh(mesh):
        state = jax.device_put(state, replicated(mesh))
        micro = jax.tree.map(lambda x: x.reshape(2, B // 2, *x.shape[1:]), b)
        sharded = shard_batch(micro, mesh, microbatched=True)
        assert sharded["images"].sharding.spec == P(None, "data")
        s2, m2 = step2(state, sharded)

        state1 = jax.device_put(state1, replicated(mesh))
        s1, m1 = step1(state1, shard_batch(b, mesh))

    assert float(m2["total_loss"]) == pytest.approx(float(m1["total_loss"]), rel=1e-4)
    # model-parameter updates match the single big-batch step
    d = jax.tree.map(
        lambda a, c: float(np.abs(np.asarray(a) - np.asarray(c)).max()),
        {k: v for k, v in s1.params["model"].items() if k != "logit_scale"},
        {k: v for k, v in s2.params["model"].items() if k != "logit_scale"},
    )
    assert max(jax.tree_util.tree_leaves(d)) < 5e-4, d


def _make_accum(loss_type, mesh, accum, dino_teacher=None):
    model = build_model(parse_model_cfg(TINY_CFG))
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((2, 16, 16, 3)), jnp.zeros((2, 12), jnp.int32))
    params = {"model": variables["params"]}
    tx, _ = build_optimizer(params, OptimCfg(lr=1e-3), const_lr(1e-3, 0, 100))
    state = create_train_state(rng, variables["params"], tx)
    cfg = StepCfg(loss_type=loss_type, accum_freq=accum)
    if loss_type == "dino":
        cfg = StepCfg(loss_type=loss_type, accum_freq=accum, dino=DINO_CFG)
    step_fn = make_train_step(model, tx, cfg, mesh=mesh, dino_teacher=dino_teacher)
    return model, None, state, step_fn


def _tiny_teacher():
    from refining_clip_via_dinov2_representations_tpu.models.dinov2 import (
        Dinov2,
        Dinov2Cfg,
    )
    from refining_clip_via_dinov2_representations_tpu.train.dino_teacher import (
        LiveDinoTeacher,
    )

    tcfg = Dinov2Cfg(hidden_size=24, layers=1, heads=2, patch_size=8,
                     native_image_size=16)
    tmodel = Dinov2(cfg=tcfg)
    tvars = tmodel.init(jax.random.PRNGKey(9), jnp.zeros((1, 16, 16, 3)))
    return LiveDinoTeacher(tmodel, tvars)


def test_accum_with_live_teacher_matches_single_big_batch():
    """The cached-rows accumulation algorithm extends to the live-teacher
    path: teacher features are cached per microbatch in phase 1 and the
    deterministic recompute in phase 2 reproduces them exactly, so the
    2x-accum DINO-soft step equals one full-batch step."""
    mesh = create_mesh(data=4, model=1, devices=jax.devices()[:4])
    teacher = _tiny_teacher()
    _, _, state, step2 = _make_accum("dino", mesh, accum=2, dino_teacher=teacher)
    _, _, state1, step1 = _make_accum("dino", mesh, accum=1, dino_teacher=teacher)
    b = {k: v for k, v in _batch(seed=11).items() if k != "dino_features"}

    with jax.set_mesh(mesh):
        state = jax.device_put(state, replicated(mesh))
        micro = jax.tree.map(lambda x: x.reshape(2, B // 2, *x.shape[1:]), b)
        s2, m2 = step2(state, shard_batch(micro, mesh, microbatched=True))

        state1 = jax.device_put(state1, replicated(mesh))
        s1, m1 = step1(state1, shard_batch(b, mesh))

    # the soft term is live (teacher actually produced features)
    assert float(m1["soft_loss"]) > 0
    assert float(m2["total_loss"]) == pytest.approx(float(m1["total_loss"]), rel=1e-4)
    assert float(m2["soft_loss"]) == pytest.approx(float(m1["soft_loss"]), rel=1e-4)
    d = jax.tree.map(
        lambda a, c: float(np.abs(np.asarray(a) - np.asarray(c)).max()),
        {k: v for k, v in s1.params["model"].items() if k != "logit_scale"},
        {k: v for k, v in s2.params["model"].items() if k != "logit_scale"},
    )
    assert max(jax.tree_util.tree_leaves(d)) < 5e-4, d


def test_accum_with_distill_teacher_matches_single_big_batch():
    """The distill CLIP teacher gets the same phase-2 cache re-injection as
    the live DINO teacher: its frozen forward runs once per microbatch
    (phase 1) and the cached rows + recomputed exp(logit_scale) reproduce the
    live values exactly, so 2x-accum distill equals one full-batch step."""
    mesh = create_mesh(data=4, model=1, devices=jax.devices()[:4])
    t_model = build_model(parse_model_cfg(TINY_CFG))
    t_vars = t_model.init(
        jax.random.PRNGKey(21), jnp.zeros((2, 16, 16, 3)), jnp.zeros((2, 12), jnp.int32)
    )

    def make(accum):
        model = build_model(parse_model_cfg(TINY_CFG))
        rng = jax.random.PRNGKey(0)
        variables = model.init(
            rng, jnp.zeros((2, 16, 16, 3)), jnp.zeros((2, 12), jnp.int32)
        )
        params = {"model": variables["params"]}
        tx, _ = build_optimizer(params, OptimCfg(lr=1e-3), const_lr(1e-3, 0, 100))
        state = create_train_state(rng, variables["params"], tx)
        cfg = StepCfg(loss_type="distill", accum_freq=accum)
        step_fn = make_train_step(
            model, tx, cfg, dist_model=t_model, dist_variables=t_vars, mesh=mesh
        )
        return state, step_fn

    state2, step2 = make(2)
    state1, step1 = make(1)
    b = {k: v for k, v in _batch(seed=13).items() if k != "dino_features"}

    with jax.set_mesh(mesh):
        state2 = jax.device_put(state2, replicated(mesh))
        micro = jax.tree.map(lambda x: x.reshape(2, B // 2, *x.shape[1:]), b)
        s2, m2 = step2(state2, shard_batch(micro, mesh, microbatched=True))

        state1 = jax.device_put(state1, replicated(mesh))
        s1, m1 = step1(state1, shard_batch(b, mesh))

    assert float(m1["distill_loss"]) > 0
    assert float(m2["total_loss"]) == pytest.approx(float(m1["total_loss"]), rel=1e-4)
    assert float(m2["distill_loss"]) == pytest.approx(float(m1["distill_loss"]), rel=1e-4)
    d = jax.tree.map(
        lambda a, c: float(np.abs(np.asarray(a) - np.asarray(c)).max()),
        {k: v for k, v in s1.params["model"].items() if k != "logit_scale"},
        {k: v for k, v in s2.params["model"].items() if k != "logit_scale"},
    )
    assert max(jax.tree_util.tree_leaves(d)) < 5e-4, d


@pytest.mark.parametrize("data,model_axis", [(8, 1), (4, 2)])
def test_adafactor_sharded_step_matches_replicated(data, model_axis):
    """--opt adafactor under ZeRO-1 (`--shard-opt-state`): the factored
    state (1-D v_row/v_col stay replicated via the ndim<2 rule, the
    full-shape momentum shards like an AdamW moment) must produce the same
    step as the fully-replicated run — the docs advertise adafactor for
    giant sharded configs, so the sharded path is load-bearing."""
    from refining_clip_via_dinov2_representations_tpu.parallel.mesh import (
        state_shardings,
    )

    mesh = create_mesh(data=data, model=model_axis)
    _, _, state_s, step_s = _make("dino", mesh, dino=DINO_CFG, opt="adafactor")
    _, _, state_r, step_r = _make("dino", mesh, dino=DINO_CFG, opt="adafactor")
    batches = [_batch(0), _batch(1)]

    with jax.set_mesh(mesh):
        sh = state_shardings(state_s, mesh, shard_opt_state=True, min_size=0)
        # at least one optimizer-state leaf must actually shard over data
        specs = [s.spec for s in jax.tree_util.tree_leaves(sh.opt_state)]
        assert any("data" in str(s) for s in specs), specs
        state_s = jax.device_put(state_s, sh)
        state_r = jax.device_put(state_r, replicated(mesh))
        for b in batches:
            sb = shard_batch(b, mesh)
            state_s, ms = step_s(state_s, sb)
            state_r, mr = step_r(state_r, sb)

    for k in ("total_loss", "classic_loss", "soft_loss", "weighted_loss"):
        assert float(ms[k]) == pytest.approx(float(mr[k]), rel=2e-4), k
    flat_s = jax.tree_util.tree_leaves(jax.tree.map(np.asarray, state_s.params))
    flat_r = jax.tree_util.tree_leaves(jax.tree.map(np.asarray, state_r.params))
    for a, b in zip(flat_s, flat_r):
        # adafactor's RMS normalization makes updates on near-zero-grad
        # leaves sign(grad)*O(lr): TP reduction-order noise can flip the
        # sign, so two correct runs differ by up to 2 sign-flipped updates
        # (2 steps x ~lr/2 each, observed 6.3e-4 on bias elements). A real
        # sharding bug (dropped shard contribution) perturbs grads by O(1),
        # which the step-2 loss equality above (rel 2e-4) would catch.
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=1e-3)


@pytest.mark.parametrize("data,model_axis", [(8, 1), (4, 2)])
def test_fsdp_step_matches_replicated(data, model_axis):
    """ZeRO-3/FSDP (params AND AdamW moments sharded over the data axis,
    layered onto any TP sharding) is semantically neutral: two train steps
    under FSDP shardings produce the same metrics and parameters as the
    fully-replicated run on the same mesh."""
    from refining_clip_via_dinov2_representations_tpu.parallel.mesh import (
        state_shardings,
    )

    mesh = create_mesh(data=data, model=model_axis)
    _, _, state_f, step_f = _make("dino", mesh, dino=DINO_CFG)
    _, _, state_r, step_r = _make("dino", mesh, dino=DINO_CFG)
    batches = [_batch(0), _batch(1)]

    with jax.set_mesh(mesh):
        sh = state_shardings(
            state_f, mesh, shard_opt_state=True, fsdp=True, min_size=0
        )
        # the tiny tower must actually exercise FSDP: at least one param leaf
        # carries the data axis
        specs = [s.spec for s in jax.tree_util.tree_leaves(sh.params)]
        assert any("data" in str(s) for s in specs), specs
        state_f = jax.device_put(state_f, sh)
        state_r = jax.device_put(state_r, replicated(mesh))
        for b in batches:
            sb = shard_batch(b, mesh)
            state_f, mf = step_f(state_f, sb)
            state_r, mr = step_r(state_r, sb)

    for k in ("total_loss", "classic_loss", "soft_loss", "weighted_loss"):
        assert float(mf[k]) == pytest.approx(float(mr[k]), rel=2e-4), k
    flat_f = jax.tree_util.tree_leaves(jax.tree.map(np.asarray, state_f.params))
    flat_r = jax.tree_util.tree_leaves(jax.tree.map(np.asarray, state_r.params))
    for a, b in zip(flat_f, flat_r):
        # atol floors the zero-initialized bias leaves: their grads are
        # O(1e-6), so AdamW's m/sqrt(v) normalization turns fp32
        # reduction-order noise (TP+FSDP resharding) into O(0.1*lr) update
        # jitter on a few elements. A REAL sharding bug (a dropped shard's
        # grad contribution) perturbs grads by O(1) -> params by O(lr)=1e-3,
        # still 4x above this floor; the step-2 loss equality above (rel
        # 2e-4) independently pins step-1's params.
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=2.5e-4)


def test_frozen_teacher_weights_are_traced_arguments():
    """Teacher weights passed via the step's `frozen` argument are program
    PARAMETERS, not baked HLO constants: the SAME compiled step serves
    different teacher weights (one cache entry, different soft losses).
    Closure capture would embed the weights as literals — ~1.2 GB of
    constants for a dinov2-large, which broke the tunnel's remote_compile."""
    teacher = _tiny_teacher()
    model = build_model(parse_model_cfg(TINY_CFG))
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        rng, jnp.zeros((2, 16, 16, 3)), jnp.zeros((2, 12), jnp.int32)
    )
    params = {"model": variables["params"]}
    tx, _ = build_optimizer(params, OptimCfg(lr=1e-3), const_lr(1e-3, 0, 100))
    cfg = StepCfg(loss_type="dino", dino=DINO_CFG)
    step_fn = make_train_step(model, tx, cfg, dino_teacher=teacher)
    b = {k: v for k, v in _batch(seed=13).items() if k != "dino_features"}

    tvars_a = teacher.variables
    tvars_b = jax.tree.map(lambda x: x * 1.5, tvars_a)

    # fresh param/rng buffers per call: the step donates its state
    state_a = create_train_state(
        jax.random.PRNGKey(0), jax.tree.map(jnp.copy, variables["params"]), tx
    )
    _, m_a = step_fn(state_a, b, {"dino_teacher": tvars_a})
    state_b = create_train_state(
        jax.random.PRNGKey(0), jax.tree.map(jnp.copy, variables["params"]), tx
    )
    _, m_b = step_fn(state_b, b, {"dino_teacher": tvars_b})

    # different teacher weights -> different soft loss, same compiled program
    assert float(m_a["soft_loss"]) != pytest.approx(float(m_b["soft_loss"]), rel=1e-3)
    assert step_fn._cache_size() == 1, step_fn._cache_size()
