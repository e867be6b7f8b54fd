"""The pjit'd training step.

One compiled function replaces the reference's hot loop body
(`src/open_clip_train/train.py:221-425`): forward both towers → loss (with
in-step collectives) → grad → param-group AdamW → logit-scale clamp. Under a
`(data, model)` mesh the step runs GSPMD-partitioned: batches are sharded on
`data`, XLA inserts the all-reduce for gradients (replacing DDP) and shards
the contrastive B×B logits row-block-wise (replacing `local_loss`
bookkeeping).

Gradient accumulation implements upstream open_clip's cached-feature
algorithm (`trial.py:311-360`; the fork's own train.py lost the re-forward
loop, SURVEY §2.6) as two `lax.scan`s: cache rows without grad, then
re-forward each microbatch spliced into the full batch — every InfoNCE row
sees all accum×B negatives and the summed gradients equal the
single-big-batch gradient exactly (asserted in
tests/test_step_distributed_semantics.py).

λ warm-up for the DINO terms (`train.py:120-141`) is computed in-graph from
the step counter, so no recompilation per step.
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..losses import (
    DinoLossCfg,
    clip_loss,
    coca_loss,
    cyclip_loss,
    dino_enhanced_loss,
    distill_clip_loss,
    siglip_loss,
)
from ..losses.dino import DinoProjectionHead

LN100 = math.log(100.0)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any           # {"model": ..., "dino_head": ... (optional)}
    opt_state: Any
    rng: jax.Array
    # BatchNorm running statistics for BN towers (ResNet/FastViT/...);
    # None for BN-free models. Updated every step unless
    # StepCfg.freeze_bn_stats (torch BN train-mode parity).
    batch_stats: Any = None


@dataclasses.dataclass(frozen=True)
class StepCfg:
    """Static configuration of the compiled step."""

    loss_type: str = "clip"  # clip | dino | siglip | cyclip | distill | coca
    dino: DinoLossCfg = DinoLossCfg()
    accum_freq: int = 1
    enable_warmup_dino_hyperparams: bool = False
    warmup: int = 10000
    siglip_dist_impl: str = "bidir"  # bidir | shift | gather | reduce (reference default)
    coca_caption_loss_weight: float = 2.0
    coca_contrastive_loss_weight: float = 1.0
    lambda_cyc_inmodal: float = 0.25
    lambda_cyc_crossmodal: float = 0.25
    use_patch_dropout: bool = False
    # --device-preprocess: batch["images"] arrives uint8 [B,raw,raw,3]; the
    # step runs RandomResizedCrop + normalize on-device, XLA-fused with the
    # forward (ops/preprocess.py). None -> images arrive pre-normalized.
    device_preprocess: Optional[Tuple] = None  # (out_h, out_w, mean, std)
    # grad-norm metric costs a full extra pass over all gradients (~34 ms/step
    # for ViT-B/16 measured in the profile); the reference only computes it
    # when clipping (`train.py:399-417`), mirrored here.
    log_grad_norm: bool = False
    # --lock-image-freeze-bn-stats: BN towers keep their running statistics
    # fixed (FrozenBatchNorm semantics, reference `utils.py:11-47`); BN then
    # normalizes with the stored averages instead of batch statistics.
    freeze_bn_stats: bool = False


def create_train_state(
    rng: jax.Array,
    model_params: Any,
    tx: optax.GradientTransformation,
    head_params: Optional[Any] = None,
    batch_stats: Optional[Any] = None,
) -> TrainState:
    params = {"model": model_params}
    if head_params is not None:
        params["dino_head"] = head_params
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=rng,
        batch_stats=batch_stats,
    )


def _step_compiler_options() -> Optional[Dict[str, str]]:
    """Per-jit XLA:TPU tuning knobs for the train step.

    `REFINING_CLIP_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=65536,..."` — the
    axon/TPU backends accept per-compile options that the client-side
    XLA_FLAGS parser rejects (TPU flags live in the server-side compiler).
    Unset → None (XLA defaults; the measured design point needs none)."""
    raw = os.environ.get("REFINING_CLIP_XLA_OPTS", "").strip()
    if not raw:
        return None
    opts: Dict[str, str] = {}
    for item in raw.split(","):
        if not item.strip():
            continue
        k, _, v = item.partition("=")
        opts[k.strip()] = v.strip()
    return opts or None


def _lambda_overrides(cfg: StepCfg, step: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """λ warm-up (`train.py:120-141`): the reference warms ONLY lambda_soft
    (plus the unused graph/hard-neg λs) — lambda_weighted stays at full
    strength from step 0."""
    if not cfg.enable_warmup_dino_hyperparams:
        return {}
    frac = jnp.minimum(1.0, step.astype(jnp.float32) / max(1, cfg.warmup))
    return {"lambda_soft": frac * cfg.dino.lambda_soft}


def make_loss_fn(
    model,
    cfg: StepCfg,
    head: Optional[DinoProjectionHead] = None,
    dist_model=None,
    dist_variables=None,
    mesh=None,
    dino_teacher=None,
):
    """Build the pure loss closure: (params, batch, step, rng) -> (loss, metrics).

    `batch` keys: images [B,H,W,3] float, texts [B,L] int32, optional
    dino_features [B,Dd] float, optional dist_* teacher outputs.

    Distributed semantics: when `mesh` has a data axis > 1 the loss section
    runs under `shard_map` manual over the data axis (model axis, if any,
    stays under GSPMD via partial-manual mode). This reproduces the
    reference's per-rank semantics exactly: the classic CLIP term all-gathers
    features and builds local-row x global-col logits (`local_loss`), the
    DINO soft-KL / weighted terms operate on the LOCAL per-device block
    (`loss.py:350-477` operates on the per-rank batch), and SigLIP uses the
    configured ring impl (`cfg.siglip_dist_impl`) instead of materializing
    the global matrix. Without a mesh (or data==1) the same functions run
    with axis_name=None — single-device semantics, identical math.
    """
    from ..parallel.mesh import DATA_AXIS

    data_size = int(mesh.shape[DATA_AXIS]) if mesh is not None else 1
    axis_name = DATA_AXIS if data_size > 1 else None

    def _compute(rows: Dict[str, jnp.ndarray], scalars: Dict[str, jnp.ndarray]):
        """Loss from per-device feature rows; runs under shard_map when
        distributed. All returned metrics are scalars (pmean'd over data)."""
        img_f, txt_f = rows["img_f"], rows["txt_f"]
        logit_scale = scalars["logit_scale"]
        metrics: Dict[str, jnp.ndarray] = {"logit_scale": logit_scale}

        if cfg.loss_type == "clip":
            total = clip_loss(img_f, txt_f, logit_scale, axis_name=axis_name)
            metrics["contrastive_loss"] = total
        elif cfg.loss_type == "dino":
            losses = dino_enhanced_loss(
                img_f, txt_f, logit_scale, rows.get("dino_features"), cfg.dino,
                image_proj=rows.get("raw_proj"),
                axis_name=axis_name,
                lambda_overrides={
                    k: v for k, v in scalars.items()
                    if k in ("lambda_soft", "lambda_weighted", "lambda_original")
                } or None,
            )
            total = losses.pop("total_loss")
            metrics.update(losses)
        elif cfg.loss_type == "siglip":
            total = siglip_loss(
                img_f, txt_f, logit_scale, scalars.get("logit_bias", 0.0),
                axis_name=axis_name, axis_size=data_size,
                dist_impl=cfg.siglip_dist_impl,
            )
            metrics["contrastive_loss"] = total
        elif cfg.loss_type == "cyclip":
            losses = cyclip_loss(
                img_f, txt_f, logit_scale,
                lambda_inmodal=cfg.lambda_cyc_inmodal,
                lambda_crossmodal=cfg.lambda_cyc_crossmodal,
                axis_name=axis_name,
            )
            total = losses.pop("total_loss")
            metrics.update(losses)
        elif cfg.loss_type == "distill":
            losses = distill_clip_loss(
                img_f, txt_f, logit_scale,
                rows["dist_image_features"],
                rows["dist_text_features"],
                scalars["dist_logit_scale"],
                axis_name=axis_name,
            )
            total = losses["contrastive_loss"] + losses["distill_loss"]
            metrics.update(losses)
        elif cfg.loss_type == "coca":
            losses = coca_loss(
                img_f, txt_f, rows["logits"], rows["labels"], logit_scale,
                caption_loss_weight=cfg.coca_caption_loss_weight,
                clip_loss_weight=cfg.coca_contrastive_loss_weight,
                axis_name=axis_name,
            )
            total = losses["contrastive_loss"] + losses["caption_loss"]
            metrics.update(losses)
        else:
            raise ValueError(f"unknown loss_type {cfg.loss_type!r}")

        metrics["total_loss"] = total
        if axis_name is not None:
            # DDP loss-mean semantics: global metric = mean of per-rank
            # values; gradient of pmean(total) == DDP's averaged gradients.
            metrics = jax.tree.map(
                lambda m: jax.lax.pmean(m, axis_name), metrics
            )
        return metrics

    def encode_fn(params, batch, step, rng, batch_stats=None, frozen=None):
        """Forward both towers (+ teacher/head extras) → (rows, scalars,
        new_batch_stats). `rows` leaves are per-sample [B, ...]; `scalars`
        are batch-independent. Split out from `loss_fn` so gradient
        accumulation can cache rows and re-assemble full batches.

        `frozen` optionally carries the frozen-teacher weights as TRACED
        ARGUMENTS ({"dino_teacher": vars, "distill": vars}); without it the
        construction-time variables are closure-captured and baked into the
        compiled program as HLO literal constants — acceptable for tiny test
        teachers, ruinous for real ones (a dinov2-large adds ~1.2 GB of
        constants to every executable)."""
        images = batch["images"]
        if cfg.device_preprocess is not None:
            from ..ops.preprocess import preprocess_train_batch

            rng, crop_rng = jax.random.split(rng)
            out_h, out_w, mean, std = cfg.device_preprocess
            images = preprocess_train_batch(
                crop_rng, images, (out_h, out_w), mean=mean, std=std
            )
        variables = {"params": params["model"]}
        # torch BN train-mode parity: BN towers normalize with batch
        # statistics and update running stats, unless frozen
        # (`freeze_batch_norm_2d`, reference utils.py:11-47)
        train_bn = batch_stats is not None and not cfg.freeze_bn_stats
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        # `deterministic` drives BOTH PatchDropout and BN mode
        # (use_running_average). BN towers have no patch-dropout module, so
        # the dropout flag must never flip a frozen-BN tower out of
        # running-average mode (it would mutate an immutable collection).
        use_pd = cfg.use_patch_dropout and batch_stats is None
        deterministic = not (use_pd or train_bn)
        rngs = None
        if not deterministic:
            pd_rng, do_rng = jax.random.split(jax.random.fold_in(rng, 1))
            rngs = {"patch_dropout": pd_rng, "dropout": do_rng}
        new_stats = batch_stats
        if train_bn:
            out, mutated = model.apply(
                variables, images, batch["texts"],
                deterministic=deterministic, rngs=rngs,
                mutable=["batch_stats"],
            )
            new_stats = mutated["batch_stats"]
        else:
            out = model.apply(
                variables, images, batch["texts"],
                deterministic=deterministic, rngs=rngs,
            )
        img_f, txt_f = out["image_features"], out["text_features"]

        rows: Dict[str, jnp.ndarray] = {"img_f": img_f, "txt_f": txt_f}
        scalars: Dict[str, jnp.ndarray] = {"logit_scale": out["logit_scale"]}

        if cfg.loss_type == "dino":
            dino_feats = batch.get("dino_features")
            if dino_feats is None and dino_teacher is not None:
                # live-teacher mode (BASELINE configs 2-3/5): the frozen
                # DINOv2 forward runs here, inside the compiled step, on the
                # SAME (device-preprocessed) pixels the student sees —
                # replacing the reference's offline extraction + per-batch
                # mmap gather (`dino_features_etc.py:10-33`, `main.py:692-707`)
                dino_feats = dino_teacher.extract(
                    images,
                    variables=None if frozen is None
                    else frozen.get("dino_teacher"),
                )
            if dino_feats is not None:
                rows["dino_features"] = dino_feats
                if cfg.dino.use_projection and head is not None:
                    rows["raw_proj"] = head.apply(
                        {"params": params["dino_head"]}, img_f
                    )
            scalars.update(_lambda_overrides(cfg, step))
        elif cfg.loss_type == "siglip":
            if "logit_bias" in out:
                scalars["logit_bias"] = out["logit_bias"]
        elif cfg.loss_type == "distill":
            dv = dist_variables
            if frozen is not None and frozen.get("distill") is not None:
                dv = frozen["distill"]
            if "dist_image_features" in batch:
                # accum phase 2: phase-1 teacher rows re-injected via the
                # batch (the frozen teacher is deterministic and
                # stop-gradient'd — same skip as the live-DINO branch)
                rows["dist_image_features"] = batch["dist_image_features"]
                rows["dist_text_features"] = batch["dist_text_features"]
                # every CLIP built here exposes the log-scale as the
                # top-level `logit_scale` param and returns it exp'd
                # (`models/clip.py:422`) — recompute it without the forward
                scalars["dist_logit_scale"] = jnp.exp(
                    dv["params"]["logit_scale"]
                )
            else:
                # the teacher must see the SAME (device-preprocessed) pixels
                # as the student, not the raw uint8 batch
                t_out = dist_model.apply(dv, images, batch["texts"])
                rows["dist_image_features"] = jax.lax.stop_gradient(
                    t_out["image_features"]
                )
                rows["dist_text_features"] = jax.lax.stop_gradient(
                    t_out["text_features"]
                )
                scalars["dist_logit_scale"] = jax.lax.stop_gradient(
                    t_out["logit_scale"]
                )
        elif cfg.loss_type == "coca":
            rows["logits"] = out["logits"]
            rows["labels"] = out["labels"]

        return rows, scalars, new_stats

    def compute_metrics(rows, scalars):
        if axis_name is not None:
            from jax.sharding import PartitionSpec as P

            # Full-manual shard_map: rows arrive as per-device blocks over
            # `data` and replicated over `model` (the loss body has no
            # model-axis ops — it runs redundantly on each model rank, like
            # the reference loss ran per DDP rank). NOTE: partial-manual
            # mode (axis_names={"data"}) miscompiles bf16 all_gather on the
            # CPU backend (XLA AllReducePromotion check-fail), so we stay
            # fully manual here.
            return jax.shard_map(
                _compute,
                mesh=mesh,
                in_specs=(
                    jax.tree.map(lambda _: P("data"), rows),
                    jax.tree.map(lambda _: P(), scalars),
                ),
                out_specs=P(),
            )(rows, scalars)
        return _compute(rows, scalars)

    def loss_fn(params, batch, step, rng, batch_stats=None, frozen=None):
        rows, scalars, new_stats = encode_fn(
            params, batch, step, rng, batch_stats, frozen
        )
        metrics = compute_metrics(rows, scalars)
        return metrics["total_loss"], (metrics, new_stats)

    loss_fn.encode_fn = encode_fn
    loss_fn.compute_metrics = compute_metrics
    return loss_fn


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    cfg: StepCfg,
    head: Optional[DinoProjectionHead] = None,
    dist_model=None,
    dist_variables=None,
    mesh=None,
    dino_teacher=None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted train step. Call with a globally-shaped batch; shard
    inputs over the mesh before calling (parallel.shard_batch). Pass the mesh
    so the loss runs under shard_map with real per-rank semantics (see
    make_loss_fn); without it the loss uses single-device math over whatever
    GSPMD decides (fine for 1 device). `dino_teacher` (a LiveDinoTeacher)
    makes the frozen DINOv2 forward part of the compiled step when the batch
    carries no precomputed `dino_features`."""
    loss_fn = make_loss_fn(
        model, cfg, head, dist_model, dist_variables, mesh=mesh,
        dino_teacher=dino_teacher,
    )
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _forward_backward(params, batch, step, rng, batch_stats, frozen):
        (loss, (metrics, new_stats)), grads = grad_fn(
            params, batch, step, rng, batch_stats, frozen
        )
        return loss, metrics, grads, new_stats

    @partial(
        jax.jit, donate_argnums=(0,), compiler_options=_step_compiler_options()
    )
    def train_step(
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        frozen: Optional[Dict[str, Any]] = None,
    ):
        # `frozen` threads frozen-teacher weights ({"dino_teacher": vars,
        # "distill": vars}) as traced arguments — see encode_fn. Pass it on
        # EVERY call for big teachers; omitting it falls back to the
        # construction-time variables baked in as constants.
        rng, step_rng = jax.random.split(state.rng)

        if cfg.accum_freq > 1:
            # Cached-feature accumulation — the algorithm upstream open_clip
            # documents and this fork's trial.py preserves (`trial.py:311-360`;
            # the fork's own train.py lost the re-forward loop, SURVEY §2.6):
            #
            #   phase 1: forward every microbatch WITHOUT grad, cache rows;
            #   phase 2: re-forward each microbatch j with grad, splice its
            #     live rows into the cached full batch, take the FULL-batch
            #     loss, accumulate grads.
            #
            # Every sample's feature pathway is live exactly once, so the
            # summed gradients equal the single-big-batch gradient — each
            # InfoNCE row sees all accum*B negatives, not B/accum. Like the
            # reference, the per-pass loss is NOT scaled by 1/accum (the
            # full-batch loss is already a mean over accum*B rows); scalars
            # (logit_scale/bias) are live in every pass, so their gradient
            # accumulates accum× — torch-faithful. Each microbatch folds its
            # index into the rng IN BOTH PHASES, so stochastic paths
            # (device-preprocess crops, patch dropout) produce identical
            # pixels for the cached and live computation of the same rows.
            encode_fn = loss_fn.encode_fn
            compute_metrics = loss_fn.compute_metrics
            idxs = jnp.arange(cfg.accum_freq)

            def enc_body(stats, inp):
                idx, micro = inp
                rows, _, stats = encode_fn(
                    state.params, micro, state.step,
                    jax.random.fold_in(step_rng, idx), stats, frozen,
                )
                return stats, rows

            stats_p1, stacked = jax.lax.scan(
                enc_body, state.batch_stats, (idxs, batch)
            )
            cached = jax.tree.map(jax.lax.stop_gradient, stacked)

            def splice(c, r, idx):
                # replace micro-slot idx (axis 0 of the stacked cache is the
                # accum axis — unsharded, so the dynamic update stays local)
                full = jax.lax.dynamic_update_slice(
                    c, r[None], (idx,) + (0,) * r.ndim
                )
                return full.reshape((c.shape[0] * c.shape[1],) + c.shape[2:])

            def grad_body(carry, inp):
                idx, micro = inp
                acc_grads, stats = carry
                # frozen-teacher rows (live DINOv2 / distill CLIP teacher)
                # are deterministic and stop-gradient'd — feed the cached
                # phase-1 output back so phase 2 skips the (possibly giant)
                # teacher forward instead of recomputing it
                teacher_keys = (
                    "dino_features", "dist_image_features", "dist_text_features"
                )
                inject = [
                    key for key in teacher_keys
                    if key in cached and key not in micro
                ]
                if inject:
                    micro = dict(micro)
                    for key in inject:
                        micro[key] = jax.lax.dynamic_index_in_dim(
                            cached[key], idx, 0, keepdims=False
                        )

                def loss_j(params):
                    rows, scalars, st = encode_fn(
                        params, micro, state.step,
                        jax.random.fold_in(step_rng, idx), stats, frozen,
                    )
                    full_rows = jax.tree.map(
                        lambda c, r: splice(c, r, idx), cached, rows
                    )
                    metrics = compute_metrics(full_rows, scalars)
                    return metrics["total_loss"], (metrics, st)

                (_, (metrics, stats)), grads = jax.value_and_grad(
                    loss_j, has_aux=True
                )(state.params)
                acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                return (acc_grads, stats), metrics

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, new_stats), metrics_seq = jax.lax.scan(
                grad_body, (zero_grads, stats_p1), (idxs, batch)
            )
            # full-batch metrics are identical across passes; report the mean
            metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics_seq)
        else:
            _, metrics, grads, new_stats = _forward_backward(
                state.params, batch, state.step, step_rng, state.batch_stats,
                frozen,
            )

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # clamp ln-scale to [0, ln 100] (`train.py:424-425`)
        model_params = dict(params["model"])
        model_params["logit_scale"] = jnp.clip(
            model_params["logit_scale"], 0.0, LN100
        )
        params = dict(params)
        params["model"] = model_params

        if cfg.log_grad_norm:
            metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=new_opt_state, rng=rng,
            batch_stats=new_stats,
        )
        return new_state, metrics

    return train_step
