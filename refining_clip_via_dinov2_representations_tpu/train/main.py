"""Training CLI — the run-lifecycle orchestrator.

TPU-native rebuild of `src/open_clip_train/main.py:97-1167`:
flags → mesh → model/transforms → tower locking → param-group optimizer →
resume → DINO feature/index-map load → data → schedule → epoch loop
{train_one_epoch → evaluate over every val key → best-retrieval-score
tracking → checkpoint} → final artifacts (loss_steps.json,
best_metrics.json).

What one JAX runtime deletes from the reference: process-group init, DDP
wrapping, GradScaler, autocast, pinned-memory transfer management, the
worker-sharded DataLoader pairing. What stays identical: flag names, metric
names, artifact file names, checkpoint naming (`epoch_N`), and the
best-epoch selection criterion (mean of six recalls).

Usage: python -m refining_clip_via_dinov2_representations_tpu.train.main <flags>
"""

from __future__ import annotations

import json
import logging
import math
import os
import signal
import threading
import time
from datetime import datetime
from typing import Dict, Optional

import numpy as np


def random_seed(seed: int = 42, rank: int = 0):
    import random

    random.seed(seed + rank)
    np.random.seed(seed + rank)


def _data_order_flags(args) -> Dict[str, int]:
    """Flags that pin the deterministic train-batch order. Recorded in
    mid-epoch (preemption) checkpoints and compared at resume: the saved
    `step_in_epoch` counts optimizer steps under THIS order, so a mismatch
    makes the batch skip silently wrong — resume falls back to redoing the
    epoch instead."""
    import jax

    return {
        "accum_freq": max(1, int(args.accum_freq or 1)),
        "batch_size": int(args.batch_size),
        "seed": int(args.seed or 0),
        "world": int(jax.device_count()),
    }


def _fetch_remote_artifacts(remote_run_dir: str, log_base: str) -> None:
    """Copy the remote run dir's artifact-history files to `log_base` when
    they are missing locally (remote resume onto a fresh host)."""
    import fsspec

    if "://" not in remote_run_dir:
        remote_run_dir = "file://" + remote_run_dir
    for art in ("loss_steps.json", "final_itm_results.json"):
        local = os.path.join(log_base, art)
        if os.path.exists(local):
            continue
        try:
            fs, root = fsspec.core.url_to_fs(f"{remote_run_dir}/{art}")
            if fs.exists(root):
                fs.get(root, local)
                logging.info("fetched remote artifact %s", art)
        except Exception as e:  # artifact history is best-effort
            logging.warning("could not fetch remote %s: %r", art, e)


def _preload_artifacts(log_base: str, resumed_step: int, start_epoch: int):
    """Previous incarnation's loss_steps.json / final_itm_results.json, so a
    resumed run's final artifacts cover the whole history rather than
    overwriting it with only the post-resume records. Records past the
    restored position (stale when resuming an older checkpoint) are dropped."""
    loss_steps, all_results = [], []
    try:
        with open(os.path.join(log_base, "loss_steps.json")) as f:
            loss_steps = [r for r in json.load(f) if r.get("step", 0) <= resumed_step]
    except (FileNotFoundError, json.JSONDecodeError):
        pass
    try:
        with open(os.path.join(log_base, "final_itm_results.json")) as f:
            all_results = [
                e for e in json.load(f) if e.get("epoch", 0) <= start_epoch
            ]
    except (FileNotFoundError, json.JSONDecodeError):
        pass
    if loss_steps or all_results:
        logging.info(
            "resume: preloaded %d loss-step records and %d epoch-eval entries "
            "from the previous incarnation", len(loss_steps), len(all_results),
        )
    return loss_steps, all_results


def _resolve_loss_type(args) -> str:
    """Dispatch mirroring `create_loss` (`factory.py:506-588`)."""
    if args.distill_model and args.distill_pretrained:
        return "distill"
    if "coca" in args.model.lower() or args.use_coca:
        return "coca"
    if args.siglip:
        return "siglip"
    if args.use_CyClip:
        return "cyclip"
    if args.use_dino_general:
        return "dino"
    return "clip"


def _text_tower_style(args, model) -> str:
    """Which reference text-tower semantics apply to this model:
    CustomTextCLIP/CoCa delegate locking to TextTransformer.lock
    (`transformer.py:1089-1111`) and have no `model.transformer` for the
    param-group block loop (`main.py:610-620`); everything else follows the
    CLIP class (`model.py:337-398`). The reference builds CustomTextCLIP
    when the config sets custom_text, when --force-custom-text is given, or
    when the text tower is an HF model (`factory.py:405-406`) — all three
    signals are honored: the primary source is the `_custom_text` sidecar
    build_model/create_model attach to the BUILT module (covers hf-hub:
    and unregistered configs, whose registry lookup would return None),
    with args/registry fallbacks for modules built outside the factory."""
    if getattr(args, "force_custom_text", False):
        return "custom_text"
    if "coca" in args.model.lower() or getattr(args, "use_coca", False):
        return "custom_text"
    sidecar = getattr(model, "_custom_text", None)
    if sidecar is not None:
        return "custom_text" if sidecar else "clip"
    if getattr(getattr(model, "text_cfg", None), "hf_model_name", None):
        return "custom_text"
    from ..models import get_model_config

    try:
        # create_model normalizes '/' spellings the same way
        cfg = get_model_config(args.model.replace("/", "-")) or {}
    except Exception:
        cfg = {}
    return "custom_text" if cfg.get("custom_text") else "clip"


def main(args=None):
    from .params import parse_args

    args = parse_args(args) if (args is None or isinstance(args, list)) else args

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.debug:
        # numerical sanity monitor (SURVEY §5 "race detection" analogue):
        # raise on the first NaN-producing op instead of training through it
        jax.config.update("jax_debug_nans", True)
    if not args.compile_cache:
        return _main(args)
    # Persistent XLA compilation cache: a preempted-and-resumed run (the
    # TPU-fleet norm) skips the multi-minute train-step recompile. The cache
    # key covers HLO + compiler flags + topology, so sharing one dir across
    # configs is safe. The config is PROCESS-GLOBAL, so save/restore around
    # the run — an in-process caller (the test suite, a notebook) must not
    # have its own cache dir permanently rebound to ours. jax (0.9) binds
    # the cache object at the FIRST compile and ignores later config
    # updates, so each rebinding must also reset_cache() to take effect
    # (otherwise --compile-cache is a silent no-op whenever any compile
    # preceded main() in-process, and the restore leaves the suite writing
    # into the run's dir).
    from jax._src import compilation_cache as _cc

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    os.makedirs(args.compile_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", args.compile_cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _cc.reset_cache()
    try:
        return _main(args)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
        _cc.reset_cache()


def _main(args):
    import jax

    # ---- multi-host init (`main.py:113` -> `distributed.py:93-195`) ----
    # Must run before any other backend use: joins the job when launched
    # under torchrun/SLURM/OMPI-style env vars, after which jax.devices()
    # spans every host and the mesh below covers the whole job.
    from .distributed import init_distributed_device

    init_distributed_device(args)
    if jax.process_count() > 1:
        logging.info(
            "distributed: process %d/%d, %d local + %d global devices",
            jax.process_index(), jax.process_count(),
            len(jax.local_devices()), jax.device_count(),
        )

    import jax.numpy as jnp

    from ..constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD
    from ..losses import DinoLossCfg
    from ..losses.dino import DinoProjectionHead
    from ..models import create_model_and_transforms, get_tokenizer
    from ..parallel.mesh import create_mesh, log_mesh, shard_batch
    from .checkpoint import (
        export_torch_checkpoint,
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from .data import DinoFeatureStore, get_data, load_dino_index_map
    from .evaluate import evaluate
    from .helpers import epoch_retrieval_score
    from .logger import setup_logging
    from .optim import OptimCfg, build_optimizer
    from .scheduler import make_schedule
    from .step import StepCfg, create_train_state, make_train_step

    # ---- run naming + logging (`main.py:129-184`) ----
    if args.name is None:
        args.name = "-".join(
            [
                datetime.now().strftime("%Y_%m_%d-%H_%M_%S"),
                f"model_{args.model.replace('/', '-')}",
                f"lr_{args.lr}",
                f"b_{args.batch_size}",
                f"p_{args.precision}",
            ]
        )
    log_base = os.path.join(args.logs, args.name)
    checkpoint_dir = os.path.join(log_base, "checkpoints")
    os.makedirs(checkpoint_dir, exist_ok=True)
    setup_logging(
        os.path.join(log_base, "out.log"),
        logging.DEBUG if args.debug else logging.INFO,
    )
    # INVARIANT: every host seeds IDENTICALLY (no `+ rank` offset, unlike the
    # reference's `random_seed(seed, rank)`) — the map-style loader shards a
    # SHARED permutation per epoch (data.py Loader._indices), which requires
    # identical np RNG streams across hosts. Per-host decorrelation where it
    # matters comes from explicit process_index folds instead: webdataset
    # resampled streams seed per-host (webdataset.py), and device-side crop
    # rngs fold the jax step rng. Do not "fix" this back to seed+rank: it
    # would silently break multi-host CSV sharding.
    random_seed(args.seed)

    mesh = create_mesh(model=args.mesh_model_axis)
    log_mesh(mesh)
    from ..parallel.mesh import DATA_AXIS as _DATA_AXIS

    data_axis = mesh.shape[_DATA_AXIS]
    # Reference parity: --batch-size is PER data-parallel rank (per chip),
    # exactly like open_clip's per-GPU batch size under DDP. The global
    # batch is batch_size x data-axis size; each host loads its share and
    # the global array is assembled in shard_batch.
    import jax as _jax

    if data_axis % _jax.process_count() != 0:
        raise ValueError(
            f"data-axis size {data_axis} must be divisible by the host count "
            f"{_jax.process_count()}"
        )
    args.world_size = data_axis  # reference naming (ranks = chips)
    args.global_batch_size = args.batch_size * data_axis
    args.per_host_batch_size = args.global_batch_size // _jax.process_count()
    logging.info(
        "batch: %d/chip x %d chips = %d global (%d per host)",
        args.batch_size, data_axis, args.global_batch_size,
        args.per_host_batch_size,
    )

    from .loggers import Tracker

    tracker = Tracker(
        log_base, args, enable_tb="tensorboard" in (args.report_to or "")
    )

    # ---- model + transforms ----
    # nargs='+' gives a list; collapse a single value to a scalar
    # (reference main.py:307-311)
    if (isinstance(args.force_image_size, (tuple, list))
            and len(args.force_image_size) == 1):
        args.force_image_size = args.force_image_size[0]
    model, variables, preprocess_train, preprocess_val = create_model_and_transforms(
        args.model,
        args.pretrained or None,
        precision=args.precision,
        force_quick_gelu=args.force_quick_gelu,
        force_patch_dropout=args.force_patch_dropout,
        force_image_size=args.force_image_size,
        grad_checkpointing=(
            args.remat_policy
            if args.grad_checkpointing and args.remat_policy != "full"
            else args.grad_checkpointing
        ),
        cache_dir=args.cache_dir,
        aug_cfg=args.aug_cfg,
        attn_impl=args.attn_impl,
        image_mean=args.image_mean,
        image_std=args.image_std,
        image_interpolation=args.image_interpolation,
        image_resize_mode=args.image_resize_mode,
        rng=jax.random.PRNGKey(args.seed),
    )
    tokenizer = get_tokenizer(args.model, cache_dir=args.cache_dir)

    # ---- device-side preprocessing (--device-preprocess) ----
    # Host workers only decode (uint8 @ raw_size); RandomResizedCrop +
    # normalize run on-device, fused into the train step (ops/preprocess.py).
    # Eval keeps the exact host PIL pipeline for metric parity.
    device_pp = None
    if args.device_preprocess:
        from ..transform import _to_2tuple, raw_uint8_transform

        device_pp = dict(
            out_size=tuple(_to_2tuple(preprocess_train.image_size)),
            mean=getattr(preprocess_train, "mean", None),
            std=getattr(preprocess_train, "std", None),
        )
        preprocess_train = raw_uint8_transform(args.device_preprocess_raw_size)
        logging.info(
            "device preprocess: host ships uint8 %dpx, device crops to %s",
            args.device_preprocess_raw_size, device_pp["out_size"],
        )

    # distillation teacher (`main.py:341-350`)
    dist_model = dist_variables = None
    if args.distill_model and args.distill_pretrained:
        from ..models import create_model

        dist_model, dist_variables, _ = create_model(
            args.distill_model, args.distill_pretrained, precision=args.precision
        )
        dist_variables = jax.tree.map(jnp.asarray, dist_variables)

    # ---- DINO teacher features (`main.py:692-741`) ----
    # Two modes (SURVEY §7 hard part 4):
    #   * precomputed (--dino_fts_path): the reference's production path —
    #     features come from the mmap store, joined per-batch by index.
    #   * live (--dino_model_name, no --dino_fts_path): the frozen flax
    #     DINOv2 runs INSIDE the pjit'd step on the same batch — the fused
    #     teacher forward of BASELINE configs 2-3/5, mirroring the
    #     extraction the reference runs offline
    #     (`dino_features_etc.py:10-33` consumed like `main.py:692-707`).
    # Synthetic data with an explicit --synthetic-dino-dim keeps fabricating
    # random features (hermetic tests) instead of loading a teacher.
    dino_store = None
    dino_index_map = None
    dino_teacher = None
    if args.use_dino_general:
        if args.dino_fts_path:
            logging.info("[INFO] Loading precomputed DINO features from %s", args.dino_fts_path)
            dino_store = DinoFeatureStore(args.dino_fts_path)
            logging.info("[DINO] feats mmap: shape=%s", dino_store.shape)
        elif args.dataset_type == "synthetic" and not args.dino_model_name:
            # hermetic path (tests/smoke): random teacher features, no HF
            # download; a live teacher on synthetic data requires naming one
            args.synthetic_dino_dim = args.synthetic_dino_dim or 384
            logging.info(
                "[DINO] synthetic teacher features (dim %d)", args.synthetic_dino_dim
            )
        else:
            from ..models.factory import _precision_to_dtype
            from .dino_teacher import LiveDinoTeacher

            compute_dtype, _ = _precision_to_dtype(args.precision)
            dino_teacher = LiveDinoTeacher.from_pretrained(
                args.dino_model_name or "facebook/dinov2-small",
                dtype=compute_dtype,
                cache_dir=args.cache_dir,
                # the teacher inverts the STUDENT's normalization (whatever
                # the transform pipeline applied) before applying its own
                # ImageNet stats — preprocess_val keeps the pipeline's
                # mean/std even when --device-preprocess rewires train
                input_mean=tuple(
                    getattr(preprocess_val, "mean", None) or OPENAI_DATASET_MEAN
                ),
                input_std=tuple(
                    getattr(preprocess_val, "std", None) or OPENAI_DATASET_STD
                ),
            )
            # frozen teacher params ride the mesh: replicated on a pure-data
            # mesh; on a (data, model>1) mesh the teacher's transformer
            # blocks TP-shard by the same Megatron rules as the student
            # (dinov2 uses in_proj/out_proj/fc1/fc2 naming — BASELINE
            # config 5's "sharded teacher": a dinov2-giant teacher
            # replicated would waste HBM on every model rank). The teacher
            # forward runs in the GSPMD region of the step, so XLA inserts
            # the per-block collectives automatically.
            from ..parallel.mesh import MODEL_AXIS, param_shardings, replicated

            if mesh.shape[MODEL_AXIS] > 1:
                dino_teacher.variables = {
                    "params": jax.device_put(
                        dino_teacher.variables["params"],
                        param_shardings(dino_teacher.variables["params"], mesh),
                    )
                }
            else:
                dino_teacher.variables = jax.device_put(
                    dino_teacher.variables, replicated(mesh)
                )
            logging.info(
                "[DINO] live teacher %s (dim %d) runs inside the train step",
                args.dino_model_name or "facebook/dinov2-small",
                dino_teacher.model.cfg.hidden_size,
            )
        if args.dino_index_map_path:
            dino_index_map = load_dino_index_map(args.dino_index_map_path)

    data = get_data(
        args,
        (preprocess_train, preprocess_val),
        epoch=0,
        tokenizer=tokenizer,
        dino_index_map=dino_index_map,
    )
    assert len(data), "At least one train or eval dataset must be specified."

    # ---- optimizer + schedule ----
    state = None
    train_step = None
    frozen_vars = None
    total_steps = 0
    if "train" in data:
        steps_per_epoch = data["train"].dataloader.num_batches // max(1, args.accum_freq)
        total_steps = steps_per_epoch * args.epochs
        if args.skip_scheduler:
            # reference main.py: scheduler=None -> lr pinned at args.lr
            from .scheduler import const_lr

            schedule = const_lr(args.lr, 0, total_steps)
        else:
            schedule = make_schedule(args, args.lr, total_steps, steps_per_epoch)
        optim_cfg = OptimCfg(
            opt=args.opt,
            lr=args.lr,
            beta1=args.beta1,
            beta2=args.beta2,
            eps=args.eps,
            wd=args.wd,
            head_lr=args.head_lr,
            logit_scale_lr=args.logit_scale_lr,
            text_lr=args.text_lr,
            resnet_lr4=args.resnet_lr4,
            resnet_lr3=args.resnet_lr3,
            grad_clip_norm=args.grad_clip_norm,
            lock_image=args.lock_image,
            lock_image_unlocked_groups=args.lock_image_unlocked_groups,
            lock_text=args.lock_text,
            lock_text_unlocked_layers=args.lock_text_unlocked_layers,
            text_tower_style=_text_tower_style(args, model),
            freeze_projection=args.freeze_projection,
            flatten_group_lrs=args.flatten_group_lrs,
            use_param_groups=args.use_param_groups,
            mu_dtype=(None if args.adam_mu_dtype == "float32" else args.adam_mu_dtype),
        )

        head = head_params = None
        if args.use_dino_general and args.use_projection:
            if dino_store is not None:
                dino_dim = dino_store.shape[1]
            elif dino_teacher is not None:
                dino_dim = dino_teacher.model.cfg.hidden_size
            else:
                dino_dim = args.synthetic_dino_dim or 384
            head = DinoProjectionHead(
                dino_dim=dino_dim,
                projection_type=args.projection_type,
                use_layernorm=args.use_layernorm,
            )
            head_params = head.init(
                jax.random.PRNGKey(args.seed + 1),
                jnp.zeros((1, model.embed_dim)),
            )["params"]

        params = {"model": variables["params"]}
        if head_params is not None:
            params["dino_head"] = head_params
        tx, _ = build_optimizer(params, optim_cfg, schedule)
        state = create_train_state(
            jax.random.PRNGKey(args.seed), variables["params"], tx, head_params,
            batch_stats=variables.get("batch_stats"),
        )
        fsdp = getattr(args, "fsdp", False)
        from ..parallel.mesh import MODEL_AXIS

        if (
            getattr(args, "shard_opt_state", False)
            or fsdp
            or mesh.shape.get(MODEL_AXIS, 1) > 1
        ):
            # ZeRO-1 (--shard-opt-state): AdamW moments sharded over data;
            # ZeRO-3 (--fsdp): params themselves sharded over data;
            # model axis > 1: Megatron TP specs must be placed explicitly
            # at creation (jit propagation alone won't reshard) (mesh.py)
            from ..parallel.mesh import state_shardings

            state = jax.device_put(
                state,
                state_shardings(
                    state, mesh,
                    shard_opt_state=getattr(args, "shard_opt_state", False),
                    fsdp=fsdp,
                    min_size=getattr(args, "fsdp_min_size", 2**16),
                ),
            )

        dino_cfg = DinoLossCfg(
            lambda_original=args.lambda_original,
            lambda_soft=args.lambda_soft,
            # pass through verbatim: the reference computes the soft term
            # only for soft_mode == "kl_teacher" (`loss.py:356`); "none"
            # (the CLI default) and "siglip_dino" disable it
            soft_mode=args.soft_mode,
            teacher_temp=args.teacher_temp,
            soft_dino_to_text=args.soft_dino_to_text,
            text_lambda=args.text_lambda,
            text_student_temp=args.text_student_temp,
            lambda_weighted=args.lambda_weighted,
            rho=args.rho,
            c_clip=args.c_clip,
            weight_text_symmetry=args.weight_text_symmetry,
            use_projection=args.use_projection,
            projection_type=args.projection_type,
            use_layernorm=args.use_layernorm,
            residual_projection=args.residual_projection,
            residual_alpha=args.residual_alpha,
            with_diagnostics=args.dbg_print_every > 0,
        )
        want_patch_dropout = bool(
            args.force_patch_dropout
            or getattr(model.vision_cfg, "patch_dropout", 0.0)
        )
        if want_patch_dropout and variables.get("batch_stats") is not None:
            # the step ties `deterministic` to BN mode; a BN tower (ResNet /
            # FastViT hybrid) therefore never runs PatchDropout — torch would
            # still apply it under FrozenBatchNorm + train mode (step.py:240)
            logging.warning(
                "--force-patch-dropout has no effect on BatchNorm towers: "
                "PatchDropout is disabled so BN statistics handling stays "
                "correct (see train/step.py encode_fn)."
            )
        step_cfg = StepCfg(
            loss_type=_resolve_loss_type(args),
            dino=dino_cfg,
            accum_freq=args.accum_freq,
            enable_warmup_dino_hyperparams=args.enable_warmup_dino_hyperparams,
            warmup=args.warmup,
            coca_caption_loss_weight=args.coca_caption_loss_weight,
            coca_contrastive_loss_weight=args.coca_contrastive_loss_weight,
            lambda_cyc_inmodal=args.lambda_cyc_inmodal,
            lambda_cyc_crossmodal=args.lambda_cyc_crossmodal,
            # active when forced via CLI OR baked into the model config
            # (the torch reference applies PatchDropout whenever the module
            # exists and the model is in train mode)
            use_patch_dropout=want_patch_dropout,
            freeze_bn_stats=bool(args.lock_image and args.lock_image_freeze_bn_stats),
            log_grad_norm=bool(args.grad_clip_norm) or args.debug,
            siglip_dist_impl=args.loss_dist_impl or "bidir",
            device_preprocess=(
                (
                    device_pp["out_size"][0], device_pp["out_size"][1],
                    tuple(device_pp["mean"] or OPENAI_DATASET_MEAN),
                    tuple(device_pp["std"] or OPENAI_DATASET_STD),
                )
                if device_pp is not None
                else None
            ),
        )
        train_step = make_train_step(
            model, tx, step_cfg,
            head=head, dist_model=dist_model, dist_variables=dist_variables,
            mesh=mesh, dino_teacher=dino_teacher,
        )
        # frozen-teacher weights thread through the step as TRACED ARGUMENTS
        # (step.py encode_fn): closure-captured variables would be baked into
        # the compiled program as HLO literal constants (~1.2 GB of literals
        # for a dinov2-large; similarly for a distill CLIP teacher)
        frozen_vars = {}
        if dino_teacher is not None:
            frozen_vars["dino_teacher"] = dino_teacher.variables
        if dist_variables is not None:
            frozen_vars["distill"] = dist_variables
        frozen_vars = frozen_vars or None

    # ---- resume (`main.py:666-686`; remote discovery `main.py:212-249`) ----
    start_epoch = 0
    resume_step_in_epoch = 0
    if args.resume is not None and state is not None:
        if args.resume == "latest":
            # with --remote-sync the source of truth is the remote dir
            # (reference main.py:214-227; s3-only there — fsspec URLs work
            # here too, one listing covers every protocol)
            if args.remote_sync is not None:
                if args.save_most_recent:
                    raise ValueError(
                        "Cannot use save-most-recent with remote_sync and "
                        "resume latest."  # reference main.py:218-221
                    )
                remote_ckpt_dir = os.path.join(
                    args.remote_sync, args.name, "checkpoints"
                )
                if "://" not in remote_ckpt_dir:
                    remote_ckpt_dir = "file://" + remote_ckpt_dir
                resume_path = latest_checkpoint(remote_ckpt_dir)
                if resume_path:
                    from .checkpoint import fetch_remote_checkpoint

                    logging.info("=> fetching remote checkpoint %s", resume_path)
                    resume_path = fetch_remote_checkpoint(
                        resume_path, checkpoint_dir
                    )
                    # also fetch the run's artifact history: a fresh host has
                    # no local loss_steps.json, and the final sync at run end
                    # would otherwise overwrite the remote copy with only the
                    # post-resume records
                    _fetch_remote_artifacts(
                        os.path.join(args.remote_sync, args.name), log_base
                    )
            elif args.save_most_recent:
                # --save-most-recent resumes from the fixed epoch_latest
                # artifact (reference main.py:231-236), not the newest
                # epoch_N — those may be pruned or save-frequency-gated
                resume_path = os.path.join(checkpoint_dir, "epoch_latest")
                if not os.path.isdir(resume_path):
                    resume_path = None
            else:
                resume_path = latest_checkpoint(checkpoint_dir)
        else:
            resume_path = args.resume
            # direct remote resume: the reference's pt_load opens any fsspec
            # URL (`file_utils.py:69-75`, `main.py:666-686`); orbax restores
            # local directories only, so mirror the remote checkpoint first
            if "://" in resume_path:
                from .checkpoint import fetch_remote_checkpoint

                import fsspec

                fs, root = fsspec.core.url_to_fs(resume_path)
                if not fs.isdir(root):
                    raise FileNotFoundError(
                        f"--resume {args.resume}: not an orbax checkpoint "
                        "directory (a single-file .pt path? export/convert it "
                        "first, or point at the epoch_N directory)"
                    )
                logging.info("=> fetching remote checkpoint %s", resume_path)
                # mirror into a CLEARED, PER-PROCESS staging dir: merging over
                # an existing local epoch_N of the same name would leave stale
                # orbax files in a mixed tree; a foreign checkpoint must not
                # join this run's own `latest`/prune history (its name only
                # matches the epoch_N scan at the checkpoints/ top level); and
                # on a shared filesystem each multi-host process fetches its
                # own copy (as the reference's per-rank pt_load does,
                # `file_utils.py:69-75`) — a shared dir would let one
                # process's rmtree race another's restore
                import shutil

                staging = os.path.join(
                    checkpoint_dir,
                    f"_remote_staging_p{jax.process_index()}",
                )
                shutil.rmtree(staging, ignore_errors=True)
                os.makedirs(staging, exist_ok=True)
                resume_path = fetch_remote_checkpoint(resume_path, staging)
        if resume_path:
            state, start_epoch, resume_step_in_epoch, saved_order = (
                restore_checkpoint(resume_path, state)
            )
            if resume_step_in_epoch and saved_order:
                current_order = _data_order_flags(args)
                if saved_order != current_order:
                    # the recorded mid-epoch position is counted in optimizer
                    # steps under the SAVED batch order; skipping with any of
                    # these flags changed would silently drop or re-train
                    # batches. Fall back to the reference's redo-the-epoch
                    # semantics instead.
                    logging.warning(
                        "mid-epoch resume: data-order flags changed since the "
                        "preemption save (%s -> %s); cannot skip %d steps "
                        "safely — redoing epoch %d from its start",
                        saved_order, current_order, resume_step_in_epoch,
                        start_epoch,
                    )
                    resume_step_in_epoch = 0
            # restored arrays live on one device; re-replicate over the mesh
            from ..parallel.mesh import state_shardings

            state = jax.device_put(
                state,
                state_shardings(
                    state, mesh,
                    shard_opt_state=getattr(args, "shard_opt_state", False),
                    fsdp=getattr(args, "fsdp", False),
                    min_size=getattr(args, "fsdp_min_size", 2**16),
                ),
            )
            logging.info(
                "=> resuming checkpoint '%s' (epoch %d%s)", resume_path,
                start_epoch,
                f", step {resume_step_in_epoch}" if resume_step_in_epoch else "",
            )
        else:
            logging.info("=> no checkpoint found at %s", args.resume)

    # ---- remote-sync daemon (`main.py:256-275`) ----
    # verification sync first (fail fast on bad credentials/paths), then a
    # background process mirrors the run dir every --remote-sync-frequency s
    remote_sync_process = None
    if args.remote_sync is not None and jax.process_index() == 0:
        from .file_utils import remote_sync, start_sync_process

        if not remote_sync(
            log_base, os.path.join(args.remote_sync, args.name),
            args.remote_sync_protocol,
        ):
            raise RuntimeError("Error: remote sync failed. Exiting.")
        logging.info("remote sync successful.")
        remote_sync_process = start_sync_process(
            args.remote_sync_frequency,
            log_base,
            os.path.join(args.remote_sync, args.name),
            args.remote_sync_protocol,
        )
        remote_sync_process.start()

    params_file = os.path.join(log_base, "params.txt")
    with open(params_file, "w") as f:
        for name in sorted(vars(args)):
            f.write(f"{name}: {getattr(args, name)}\n")

    if args.copy_codebase:
        _copy_codebase(log_base)

    # eval-only path (`main.py:808-822`)
    eval_keys = [k for k in ("val", "flickr30k-val", "mscoco-val") if k in data]
    # zero-shot data without retrieval val keys must still evaluate
    # (the reference calls evaluate() unconditionally once per epoch)
    has_zs = any(k in data for k in ("imagenet-val", "imagenet-v2"))
    eval_rounds = eval_keys or (["val"] if has_zs else [])
    if "train" not in data:
        variables_eval = {
            k: variables[k] for k in ("params", "batch_stats") if k in variables
        }
        for i, key in enumerate(eval_rounds):
            evaluate(model, variables_eval, data, start_epoch, args, tokenizer,
                     val_key=key, include_zero_shot=(i == 0), mesh=mesh)
        _final_remote_sync(remote_sync_process, args, log_base)
        return

    # ---- pre-train evaluation over every val key (`main.py:833-859`) ----
    # a mid-epoch resume of epoch 0 skips this: the model is no longer the
    # untrained one, and the pre-train numbers already exist in the first
    # incarnation's logs
    pretrain_results = []
    if start_epoch == 0 and resume_step_in_epoch == 0 and eval_rounds:
        variables_eval = {"params": state.params["model"]}
        if state.batch_stats is not None:
            variables_eval["batch_stats"] = state.batch_stats
        for i, key in enumerate(eval_rounds):
            try:
                m = evaluate(model, variables_eval, data, 0, args, tokenizer,
                             val_key=key, include_zero_shot=(i == 0), mesh=mesh)
                if m:  # recorded as the epoch-0 entry of
                    # final_itm_results.json (`main.py:826-859`) — the
                    # reference keeps the pre-train eval in the artifact but
                    # excludes it from best-epoch tracking (`main.py:905+`)
                    pretrain_results.append({"val_name": key, "metrics": m})
            except Exception as e:  # pre-train eval must not kill the run
                logging.warning("pre-train eval on %s failed: %r", key, e)

    # ---- epoch loop ----
    # a resumed run preloads the previous incarnation's artifact history so
    # loss_steps.json / final_itm_results.json cover the WHOLE run, not just
    # the post-resume steps (records beyond the restored optimizer step —
    # possible when resuming an older-than-latest checkpoint — are dropped)
    loss_steps, all_results = _preload_artifacts(
        log_base, resumed_step=int(state.step), start_epoch=start_epoch
    ) if args.resume else ([], [])
    if pretrain_results and not any(r.get("epoch") == 0 for r in all_results):
        all_results.insert(0, {"epoch": 0, "results": pretrain_results})
    best = {"score": float("-inf"), "tie": float("-inf"), "epoch": -1}
    for prior in all_results:
        if prior.get("epoch") == 0:
            continue  # pre-train eval is an artifact row, never "best"
        score, tie = epoch_retrieval_score(prior["results"])
        if not math.isnan(score) and (score, tie) > (best["score"], best["tie"]):
            best = {"score": score, "tie": tie, "epoch": prior["epoch"]}
            if prior["results"]:
                best["metrics"] = {
                    r["val_name"]: r["metrics"] for r in prior["results"]
                }

    # ---- graceful preemption (--save-on-preemption) ----
    # TPU-fleet maintenance/preemption delivers SIGTERM to every host with a
    # short grace window; finish the in-flight step, checkpoint, final-sync,
    # exit 0. Resume redoes the interrupted epoch from its start (the saved
    # state keeps the extra optimizer steps — documented redo semantics).
    preempt = threading.Event()
    prev_sigterm = None
    if args.save_on_preemption:
        def _on_sigterm(signum, frame):
            logging.warning(
                "SIGTERM: checkpointing and exiting at the next step boundary"
            )
            preempt.set()

        if threading.current_thread() is threading.main_thread():
            prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
        else:  # signal handlers are main-thread-only (embedded callers)
            logging.warning(
                "--save-on-preemption: not on the main thread; SIGTERM "
                "handler not installed"
            )

    # run-level --stop-after-steps budget, decremented across epochs (0 = off)
    steps_budget = max(0, int(getattr(args, "stop_after_steps", 0) or 0))
    for epoch in range(start_epoch, args.epochs):
        skip_steps = resume_step_in_epoch if epoch == start_epoch else 0
        logging.info(
            "Start epoch %d%s", epoch,
            f" (resuming at optimizer step {skip_steps})" if skip_steps else "",
        )
        state, epoch_records, steps_done, applied_skip = train_one_epoch(
            train_step, state, data["train"], mesh, args, epoch, tracker=tracker,
            stop_event=preempt, skip_steps=skip_steps, stop_after=steps_budget,
            frozen=frozen_vars,
        )
        if steps_budget:
            steps_budget = max(0, steps_budget - steps_done)
        loss_steps.extend(epoch_records)
        if preempt.is_set():
            # a distinct `epoch_N_preempt` dir: overwriting epoch_N (the
            # newest COMPLETED checkpoint when --save-frequency 1) would
            # rmtree it before the replacement commits — a kill in that
            # window loses the only durable state. The payload records the
            # mid-epoch position (step_in_epoch) so `--resume latest`
            # CONTINUES epoch N at the next batch; a loader without batch
            # skipping falls back to redoing the epoch. `applied_skip` is the
            # skip the loader ACTUALLY performed (0 on the redo fallback), so
            # the recorded position stays truthful even then.
            step_in_epoch = applied_skip + steps_done
            logging.warning(
                "preemption: saving epoch_%d_preempt (at optimizer step %d "
                "of the epoch; resume continues there) and shutting down",
                epoch, step_in_epoch,
            )
            save_checkpoint(
                checkpoint_dir, state, epoch,
                save_most_recent=args.save_most_recent,
                async_save=args.async_checkpoint,
                name_suffix="_preempt",
                step_in_epoch=step_in_epoch,
                data_order=_data_order_flags(args),
            )
            break
        completed_epoch = epoch + 1

        variables_eval = {"params": state.params["model"]}
        if state.batch_stats is not None:
            variables_eval["batch_stats"] = state.batch_stats
        epoch_results = []
        for i, key in enumerate(eval_rounds):
            m = evaluate(
                model, variables_eval, data, completed_epoch, args, tokenizer,
                val_key=key, include_zero_shot=(i == 0), mesh=mesh,
            )
            if m:
                epoch_results.append({"val_name": key, "metrics": m})
                tracker.log_scalars(
                    {k: v for k, v in m.items() if isinstance(v, (int, float))},
                    step=completed_epoch, prefix=f"val/{key}",
                )
        all_results.append({"epoch": completed_epoch, "results": epoch_results})

        score, tie = epoch_retrieval_score(epoch_results)
        if not math.isnan(score) and (score, tie) > (best["score"], best["tie"]):
            best = {"score": score, "tie": tie, "epoch": completed_epoch}
            if epoch_results:
                best["metrics"] = {
                    r["val_name"]: r["metrics"] for r in epoch_results
                }

        # checkpoints (`main.py:940-974`)
        if args.save_frequency > 0 and (
            completed_epoch % args.save_frequency == 0 or completed_epoch == args.epochs
        ):
            save_checkpoint(
                checkpoint_dir,
                state,
                completed_epoch,
                save_most_recent=args.save_most_recent,
                delete_previous=args.delete_previous_checkpoint,
                async_save=args.async_checkpoint,
            )

    if prev_sigterm is not None:
        # restore the caller's handler: leaving _on_sigterm installed after
        # main() returns would make a later SIGTERM set a dead event and
        # never terminate an embedded caller
        signal.signal(signal.SIGTERM, prev_sigterm)

    # ---- final artifacts (`main.py:977-1098`) ----
    with open(os.path.join(log_base, "loss_steps.json"), "w") as f:
        json.dump(loss_steps, f)
    _plot_loss_curves(loss_steps, log_base)
    with open(os.path.join(log_base, "final_itm_results.json"), "w") as f:
        json.dump(all_results, f, default=float)
    if all_results and any(e["results"] for e in all_results):
        try:
            from ..eval.my_metrics import extract_and_plot_itm_scores

            extract_and_plot_itm_scores(
                os.path.join(log_base, "final_itm_results.json"),
                os.path.join(log_base, "itm_recall_plot.png"),
                os.path.join(log_base, "itm_similarity_plot.png"),
                save_csv_path=os.path.join(log_base, "itm_scores.csv"),
            )
        except Exception as e:  # plots must never fail the run (main.py:1050-1053)
            logging.warning("ITM plotting failed: %r", e)
    if best["epoch"] >= 0:
        with open(os.path.join(log_base, "best_metrics.json"), "w") as f:
            json.dump(best, f, default=float)
        logging.info(
            "Best epoch %d with retrieval score %.4f", best["epoch"], best["score"]
        )
        tracker.log_scalars(
            {"retrieval_score": best["score"], "epoch": best["epoch"]},
            step=args.epochs, prefix="best",
        )
    for artifact in ("loss_steps.json", "final_itm_results.json", "best_metrics.json",
                     "loss_curves.png", "itm_recall_plot.png", "itm_scores.csv"):
        tracker.log_artifact(os.path.join(log_base, artifact))
    tracker.finish()
    if state is not None:
        try:
            export_torch_checkpoint(
                state, args.epochs, args.name,
                os.path.join(checkpoint_dir, "final_torch_state.pt"),
            )
        except ImportError:
            logging.info("torch unavailable; skipping interop export")
        except NotImplementedError as e:
            # interop export covers ViT towers; a best-effort artifact must
            # never kill a finished run
            logging.warning("interop export skipped: %s", e)

    # ---- CLIP-blind post-training check (`main.py:1100-1149`) ----
    if args.run_clip_blind and args.use_dino_general and (
        dino_store is not None or dino_teacher is not None
    ):
        from ..eval.clip_blind import run_clip_blind_on_split

        if state is not None:
            variables_final = {"params": state.params["model"]}
            if state.batch_stats is not None:
                variables_final["batch_stats"] = state.batch_stats
        else:
            variables_final = {k: variables[k] for k in ("params", "batch_stats")
                               if k in variables}
        blind_dir = os.path.join(log_base, "clip_blind")
        if dino_teacher is not None:
            # live-teacher mode: both splits get teacher features computed on
            # the fly from the SAME images the CLIP encoder sees — no
            # precomputed store, no path alignment, val needs no extra flags.
            # Both splits are non-fatal: a loader without image paths
            # (webdataset/synthetic val) must not kill the finished run or
            # skip the final remote sync.
            try:
                run_clip_blind_on_split(
                    "val", data, model, variables_final, None, None, blind_dir,
                    max_images=args.clip_blind_max_images,
                    dino_teacher=dino_teacher,
                )
            except Exception as e:
                logging.warning("[clip-blind] val-split check failed: %r", e)
            try:  # train-split failure is non-fatal (`main.py:1148-1149`)
                # the train loader yields no image paths (train mode); reuse
                # the production eval-CSV loader path over the train CSV
                if args.dataset_type == "csv" and args.train_data:
                    import argparse as _ap

                    from .data import get_csv_dataset

                    blind_args = _ap.Namespace(
                        **{**vars(args), "val_data": args.train_data}
                    )
                    blind_info = get_csv_dataset(
                        blind_args, preprocess_val, is_train=False,
                        tokenizer=tokenizer,
                    )
                    run_clip_blind_on_split(
                        "train", {"train": blind_info},
                        model, variables_final, None, None, blind_dir,
                        max_images=args.clip_blind_max_images,
                        dino_teacher=dino_teacher,
                    )
            except Exception as e:
                logging.warning("[clip-blind] train-split check failed: %r", e)
            _final_remote_sync(remote_sync_process, args, log_base)
            return best
        # VAL split needs its own teacher features + index map
        # (`main.py:1107-1128`: --dino_fts_path_val / --dino_index_map_path_val;
        # skip with a warning when absent — the TRAIN map does not cover val
        # paths and would silently align wrong rows via basename fallback)
        if getattr(args, "dino_fts_path_val", None) and getattr(
            args, "dino_index_map_path_val", None
        ):
            val_store = DinoFeatureStore(args.dino_fts_path_val)
            val_map = load_dino_index_map(args.dino_index_map_path_val)
            run_clip_blind_on_split(
                "val", data, model, variables_final,
                np.asarray(val_store.features),
                {"path_to_index": val_map or {}}, blind_dir,
                max_images=args.clip_blind_max_images,
            )
        else:
            logging.warning(
                "[CLIP-blind/val] missing --dino_fts_path_val / "
                "--dino_index_map_path_val; skipping."
            )
        try:  # train-split failure is non-fatal (`main.py:1148-1149`)
            run_clip_blind_on_split(
                "train", data, model, variables_final,
                np.asarray(dino_store.features),
                {"path_to_index": dino_index_map or {}}, blind_dir,
                max_images=args.clip_blind_max_images,
            )
        except Exception as e:
            logging.warning("[clip-blind] train-split check failed: %r", e)

    # ---- final remote sync (`main.py:1152-1163`) ----
    _final_remote_sync(remote_sync_process, args, log_base)
    return best


def _final_remote_sync(remote_sync_process, args, log_base):
    """Terminate the sync daemon and flush the run dir one last time
    (`main.py:1152-1163`). Always drains outstanding async checkpoint
    writes first so the final sync (and process exit) never races them."""
    from .checkpoint import wait_for_checkpoints

    wait_for_checkpoints()
    if remote_sync_process is None:
        return
    import os

    from .file_utils import remote_sync

    logging.info("Final remote sync.")
    remote_sync_process.terminate()
    if remote_sync(
        log_base, os.path.join(args.remote_sync, args.name),
        args.remote_sync_protocol,
    ):
        logging.info("Final remote sync successful.")
    else:
        logging.info("Final remote sync failed.")


def _copy_codebase(log_base):
    """Snapshot the framework source into the run dir (`main.py:1170-1187`)."""
    import shutil

    src = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(log_base, "code", os.path.basename(src))
    if os.path.exists(dst):
        logging.info("codebase copy exists at %s; skipping", dst)
        return
    shutil.copytree(
        src, dst,
        ignore=shutil.ignore_patterns("__pycache__", "*.so", "assets"),
    )
    logging.info("copied codebase to %s", dst)


def _plot_loss_curves(loss_steps, log_base):
    """Loss-vs-step PNG (`main.py:1001-1035`); never fails the run."""
    if not loss_steps:
        return
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        steps = [r["step"] for r in loss_steps]
        plt.figure()
        for key in ("total_loss", "classic_loss", "soft_loss", "weighted_loss",
                    "contrastive_loss"):
            vals = [r.get(key) for r in loss_steps]
            if any(v is not None for v in vals):
                plt.plot(steps, [v if v is not None else float("nan") for v in vals],
                         label=key)
        plt.xlabel("Step"); plt.ylabel("Loss")
        plt.title("Training loss")
        plt.legend(); plt.grid(True)
        plt.savefig(os.path.join(log_base, "loss_curves.png"))
        plt.close()
    except Exception as e:
        logging.warning("loss plotting failed: %r", e)


def train_one_epoch(train_step, state, train_data, mesh, args, epoch, tracker=None,
                    stop_event=None, skip_steps=0, stop_after=0, frozen=None):
    """One epoch of the hot loop (`train.py:145-584`): iterate, shard, step,
    meter samples/s, log every `--log-every-n-steps`. `stop_event` (set by
    the SIGTERM handler under --save-on-preemption) ends the epoch at the
    next step boundary. `skip_steps` resumes a mid-epoch checkpoint: the
    loader skips the first skip_steps*accum batches (index-level for the
    map-style loaders, raw-record-level for webdataset — no decode cost) so
    the run continues exactly where the preempted one stopped. `stop_after`
    (> 0) ends the run through the stop_event after that many optimizer
    steps within THIS call — main() threads the run-level --stop-after-steps
    budget through it, decremented across epochs.

    Returns (state, records, steps_done, applied_skip): steps_done is the
    number of optimizer steps executed in this call, applied_skip the skip
    the loader actually performed (0 when it fell back to redoing the
    epoch) — together they give a preemption save its true mid-epoch
    position without any extra device sync in main()."""
    import jax

    from ..parallel.mesh import shard_batch

    loader = train_data.dataloader
    loader.set_epoch(epoch)
    records = []
    t_end = time.time()
    samples = 0
    accum = max(1, args.accum_freq)
    micro = []
    if skip_steps:
        if hasattr(loader, "skip_next_batches"):
            loader.skip_next_batches(skip_steps * accum)
        else:
            logging.warning(
                "train loader %s cannot skip batches; redoing epoch %d from "
                "its start (extra optimizer steps kept — the reference's "
                "redo semantics)", type(loader).__name__, epoch,
            )
            skip_steps = 0
    stop_after = max(0, int(stop_after))
    steps_done = 0
    # Host-side step counter: fetching `state.step` from the device every
    # iteration would sync the host to step completion and serialize data
    # loading with device compute. One fetch here, then host arithmetic —
    # the dispatch of step t overlaps the host assembling batch t+1.
    host_step = int(state.step)
    # lag-1 backpressure: without any sync the host can queue an unbounded
    # number of in-flight steps (each pinning a full device batch); blocking
    # on step t-1 right after dispatching step t bounds run-ahead to one
    # step while keeping the compute/input overlap.
    prev_sync = None
    window_samples = 0
    window_t0 = time.time()

    profiling = bool(getattr(args, "profile", False)) and epoch == 0
    if profiling:
        import jax.profiler

        trace_dir = os.path.join(args.logs, args.name, "profile")
        jax.profiler.start_trace(trace_dir)
        logging.info("jax.profiler trace -> %s", trace_dir)

    num_batches = getattr(loader, "num_batches", None)
    for i, batch in enumerate(loader):
        if stop_event is not None and stop_event.is_set():
            if profiling:
                import jax.profiler

                jax.profiler.stop_trace()
                profiling = False  # epilogue must not stop_trace twice
            logging.warning("stop requested: leaving epoch %d early", epoch)
            break
        batch = {
            k: v for k, v in batch.items() if k in ("images", "texts", "dino_features")
        }
        batch = {k: np.asarray(v) for k, v in batch.items()}
        if args.use_dino_general and "dino_features" not in batch:
            # zero out DINO lambdas when the batch lacks teacher features
            # (`train.py:134-139`) — handled by supplying no dino_features.
            pass
        if accum > 1:
            micro.append(batch)
            if len(micro) < accum:
                continue
            batch = {
                k: np.stack([m[k] for m in micro]) for k in micro[0]
            }
            micro = []

        data_time = time.time() - t_end
        with jax.set_mesh(mesh):
            sharded = shard_batch(batch, mesh, microbatched=accum > 1)
            state, metrics = train_step(state, sharded, frozen)
        if prev_sync is not None:
            jax.block_until_ready(prev_sync)
        prev_sync = metrics["total_loss"]

        host_step += 1
        step = host_step
        if profiling and step >= getattr(args, "profile_steps", 5):
            import jax.profiler

            # under the async hot loop only step t-1 is synced; block on the
            # in-flight step so the trace's last step isn't truncated
            jax.block_until_ready(prev_sync)
            jax.profiler.stop_trace()
            profiling = False
        bsz = batch["images"].shape[-4] * accum
        samples += bsz
        window_samples += bsz
        t_end = time.time()
        steps_done += 1
        stop_now = bool(stop_after and steps_done >= stop_after)
        if stop_now:
            # run-budget knob: end the run after N optimizer steps this call,
            # through the same save-and-shutdown path as a preemption. The
            # break below (after the logging block) is immediate — waiting
            # for the next iteration's top-of-loop check would pull one more
            # global batch from the loader and throw it away.
            logging.warning(
                "--stop-after-steps %d reached at epoch %d", stop_after, epoch
            )
            if stop_event is not None:
                stop_event.set()

        # the loader yields num_batches - skipped_batches items on a resumed
        # epoch, so the forced end-of-epoch log record anchors at the SHIFTED
        # last index
        is_last = num_batches and i == num_batches - 1 - skip_steps * accum
        if step % args.log_every_n_steps == 0 or is_last:
            m = {k: float(v) for k, v in metrics.items() if np.ndim(v) == 0}
            # window-averaged samples/s since the last log line (the fetch of
            # `m` above is the sync point; per-step wall times are dispatch
            # times under async execution and would over-read)
            now = time.time()
            ips = window_samples / max(now - window_t0, 1e-9)
            window_samples, window_t0 = 0, now
            logging.info(
                "Train Epoch: %d [%d] total_loss: %.5f logit_scale: %.3f "
                "%.1f samples/s (data %.3fs)",
                epoch, step, m.get("total_loss", float("nan")),
                m.get("logit_scale", float("nan")), ips, data_time,
            )
            records.append({"step": step, "epoch": epoch, **m})
            if tracker is not None:
                tracker.log_scalars({**m, "samples_per_s": ips}, step=step)
        if stop_now:
            break
    if profiling:
        import jax.profiler

        if prev_sync is not None:
            jax.block_until_ready(prev_sync)
        jax.profiler.stop_trace()
    return state, records, steps_done, skip_steps


if __name__ == "__main__":
    main()
