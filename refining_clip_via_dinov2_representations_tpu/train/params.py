"""Training CLI flag surface.

Mirrors the reference's argparse surface (`src/open_clip_train/params.py:29-1121`,
~140 flags) with identical flag names for the subset that drives behaviour in
this framework; torch-only flags (horovod, ddp-static-graph, torchcompile…)
are accepted and ignored with a warning so reference launch scripts keep
working. New TPU-native flags are marked [tpu].
"""

from __future__ import annotations

import argparse


def get_default_params(model_name: str):
    """Model-family default hparams (`params.py:6-12`)."""
    model_name = model_name.lower()
    if "vit" in model_name:
        return {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.98, "eps": 1.0e-6}
    return {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.999, "eps": 1.0e-8}


class ParseKwargs(argparse.Action):
    """`--aug-cfg k=v` parsing (`params.py:15-26`)."""

    def __call__(self, parser, namespace, values, option_string=None):
        kw = {}
        for value in values:
            key, _, v = value.partition("=")
            try:
                import ast

                kw[key] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                kw[key] = v
        setattr(namespace, self.dest, kw)


def parse_args(args=None):
    parser = argparse.ArgumentParser("TPU-native open_clip training")

    # ---- data ----
    parser.add_argument("--train-data", type=str, default=None)
    parser.add_argument("--val-data", type=str, default=None)
    parser.add_argument("--flickr-val-data", dest="flickr_val_data", type=str, default=None)
    parser.add_argument("--mscoco-val-data", dest="mscoco_val_data", type=str, default=None)
    parser.add_argument("--train-num-samples", type=int, default=None)
    parser.add_argument("--val-num-samples", type=int, default=None)
    parser.add_argument(
        "--dataset-type", choices=["webdataset", "csv", "synthetic", "auto"], default="auto"
    )
    parser.add_argument("--dataset-resampled", default=False, action="store_true")
    parser.add_argument("--csv-separator", type=str, default=",")
    parser.add_argument("--csv-img-key", type=str, default="filepath")
    parser.add_argument("--csv-caption-key", type=str, default="title")
    parser.add_argument("--imagenet-val", type=str, default=None)
    parser.add_argument("--imagenet-v2", type=str, default=None)
    parser.add_argument("--imagenet-train", type=str, default=None)
    parser.add_argument("--cache-dir", type=str, default=None)
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument(
        "--batch-size", type=int, default=64,
        help="Batch size per data-parallel rank (per chip) — reference "
             "per-GPU semantics; global batch = batch-size x data-axis size.",
    )
    parser.add_argument("--aug-cfg", nargs="*", default={}, action=ParseKwargs)
    parser.add_argument(
        "--flickr30k_val", type=str, default=None,
        help="Path to Flickr30k validation CSV (reference name; alias of "
             "--flickr-val-data)",
    )
    parser.add_argument(
        "--mscoco_val", type=str, default=None,
        help="Path to MSCOCO validation CSV (reference name; alias of "
             "--mscoco-val-data)",
    )
    parser.add_argument(
        "--train-data-upsampling-factors", type=str, default=None,
        help="webdataset multi-source sampling weights (reference "
             "params.py:538); single-source pipelines ignore it",
    )
    # preprocessing overrides (reference params.py:861-890)
    parser.add_argument("--image-mean", type=float, nargs="+", default=None)
    parser.add_argument("--image-std", type=float, nargs="+", default=None)
    parser.add_argument("--image-interpolation", type=str, default=None,
                        choices=["bicubic", "bilinear", "random"])
    parser.add_argument("--image-resize-mode", type=str, default=None,
                        choices=["shortest", "longest", "squash"])

    # ---- schedule / optim ----
    parser.add_argument("--epochs", type=int, default=32)
    parser.add_argument("--epochs-cooldown", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--beta1", type=float, default=None)
    parser.add_argument("--beta2", type=float, default=None)
    parser.add_argument("--eps", type=float, default=None)
    parser.add_argument("--wd", type=float, default=0.2)
    parser.add_argument("--momentum", type=float, default=None)
    parser.add_argument("--warmup", type=int, default=10000)
    parser.add_argument(
        "--lr-scheduler", type=str, default="cosine",
        choices=["cosine", "const", "const-cooldown"],
    )
    parser.add_argument("--lr-min", type=float, default=0.0)
    parser.add_argument("--lr-cooldown-end", type=float, default=0.0)
    parser.add_argument("--lr-cooldown-power", type=float, default=1.0)
    parser.add_argument("--grad-clip-norm", type=float, default=None)
    parser.add_argument("--accum-freq", type=int, default=1)
    parser.add_argument(
        "--opt", type=str, default="adamw",
        help="optimizer: adamw | lion | lamb | adafactor | sgd "
             "(reference accepts 'timm/{name}' — the prefix maps onto the "
             "optax optimizer of the same name; params.py:742-746)")
    # per-group LRs (`params.py:696-727`)
    parser.add_argument("--head-lr", dest="head_lr", type=float, default=1e-4)
    parser.add_argument("--logit-scale-lr", dest="logit_scale_lr", type=float, default=1e-6)
    parser.add_argument("--text-lr", dest="text_lr", type=float, default=5e-5)
    parser.add_argument("--resnet-lr4", dest="resnet_lr4", type=float, default=2e-5)
    parser.add_argument("--resnet-lr3", dest="resnet_lr3", type=float, default=1e-5)
    parser.add_argument("--use-param-groups", dest="use_param_groups",
                        default=True, action="store_true")
    parser.add_argument("--no-param-groups", dest="use_param_groups", action="store_false")
    parser.add_argument("--flatten-group-lrs", default=False, action="store_true",
                        help="bug-compatible: scheduler overrides per-group LRs")

    # ---- model ----
    parser.add_argument("--model", type=str, default="RN50")
    parser.add_argument("--pretrained", type=str, default="")
    parser.add_argument(
        "--precision",
        choices=["amp", "amp_bf16", "amp_bfloat16", "bf16", "fp16", "pure_bf16",
                 "pure_fp16", "fp32"],
        default="amp",
    )
    parser.add_argument("--force-quick-gelu", default=False, action="store_true")
    parser.add_argument("--force-custom-text", default=False, action="store_true")
    parser.add_argument("--force-patch-dropout", type=float, default=None)
    parser.add_argument("--force-image-size", type=int, nargs="+", default=None)
    parser.add_argument("--grad-checkpointing", default=False, action="store_true")
    parser.add_argument(
        "--adam-mu-dtype",
        type=str,
        default="float32",
        choices=["float32", "bfloat16"],
        help="dtype of AdamW's first moment; bfloat16 halves its HBM "
        "footprint (second moment stays fp32).",
    )
    parser.add_argument(
        "--remat-policy",
        type=str,
        default="full",
        choices=["full", "dots_saveable", "dots_with_no_batch_dims_saveable",
                 "offload_dots_with_no_batch_dims"],
        help="jax.checkpoint policy used with --grad-checkpointing: 'full' "
        "recomputes everything (torch.utils.checkpoint parity); the dots_* "
        "policies save matmul outputs and recompute only elementwise ops "
        "(selective rematerialization — more memory, far less recompute); "
        "offload_* streams them to pinned host RAM instead (measured 8x "
        "slower than recompute on this platform — see COMPONENTS.md). "
        "Applies to every tower family.",
    )
    parser.add_argument("--lock-image", default=False, action="store_true")
    parser.add_argument("--lock-image-unlocked-groups", type=int, default=0)
    parser.add_argument("--lock-image-freeze-bn-stats", default=False, action="store_true")
    parser.add_argument("--lock-text", default=False, action="store_true")
    parser.add_argument("--lock-text-unlocked-layers", type=int, default=0)
    parser.add_argument("--lock-text-freeze-layer-norm", default=False, action="store_true")
    parser.add_argument("--torchscript", default=False, action="store_true")
    parser.add_argument("--torchcompile", default=False, action="store_true")
    parser.add_argument("--trace", default=False, action="store_true")
    parser.add_argument("--use-bn-sync", default=False, action="store_true")
    parser.add_argument("--siglip", default=False, action="store_true")
    parser.add_argument("--loss-dist-impl", type=str, default=None)

    # ---- DINO thesis knobs (`params.py:58-530`) ----
    parser.add_argument("--use_dino_general", default=False, action="store_true")
    parser.add_argument("--lambda_original", type=float, default=1.0)
    parser.add_argument("--lambda_soft", type=float, default=0.0)
    parser.add_argument("--soft_mode", type=str, default="none",
                        choices=["none", "siglip_dino", "kl_teacher"])
    parser.add_argument("--teacher_temp", type=float, default=0.15)
    parser.add_argument("--student_temp", type=float, default=None)
    parser.add_argument("--soft_dino_to_text", default=False, action="store_true")
    parser.add_argument("--text_lambda", type=float, default=0.2)
    parser.add_argument("--text_student_temp", type=float, default=0.05)
    parser.add_argument("--lambda_weighted", type=float, default=0.0)
    parser.add_argument("--rho", type=float, default=0.1)
    parser.add_argument("--c_clip", type=float, default=1.0)
    parser.add_argument("--weight_text_symmetry", default=False, action="store_true")
    parser.add_argument("--use_projection", default=True, action="store_true")
    parser.add_argument("--no_projection", dest="use_projection", action="store_false")
    parser.add_argument("--projection_type", type=str, default="mlp",
                        choices=["linear", "mlp"])
    parser.add_argument("--use_layernorm", default=False, action="store_true")
    parser.add_argument("--residual_projection", default=False, action="store_true")
    parser.add_argument("--residual_alpha", type=float, default=None)
    parser.add_argument("--freeze_projection", default=False, action="store_true",
                        help="bug-compatible: never update the DINO head")
    parser.add_argument("--enable_warmup_dino_hyperparams", default=False, action="store_true")
    parser.add_argument("--dino_fts_path", type=str, default=None)
    parser.add_argument("--dino_index_map_path", type=str, default=None)
    parser.add_argument("--dino_model_name", type=str, default=None,
                        help="live DINOv2 teacher (HF name or local dir) used when "
                             "--use_dino_general is set without --dino_fts_path: the "
                             "frozen teacher runs inside the train step on the same "
                             "batch (BASELINE configs 2-3, 5). Unset it resolves to "
                             "facebook/dinov2-small (the reference default) — except "
                             "on synthetic data, which fabricates random features "
                             "unless a teacher is named explicitly (hermetic tests)")
    parser.add_argument("--synthetic-dino-dim", dest="synthetic_dino_dim",
                        type=int, default=None,
                        help="[tpu] synthetic data fabricates random teacher features "
                             "of this dim instead of running a live teacher (tests)")
    parser.add_argument("--dbg_print_every", type=int, default=0)
    parser.add_argument("--dino_fts_path_val", type=str, default=None,
                        help="precomputed DINO features for the val split")
    parser.add_argument("--dino_index_map_path_val", type=str, default=None)

    # ---- fork sweep-surface knobs (`params.py:232-530`) ----
    # The reference parses this whole family for its sweep scripts
    # (sweep_manual.sh) but its committed loss consumes none of them
    # (SURVEY §5 config); accepted here so the same launch commands run,
    # and recorded into params.txt for sweep bookkeeping.
    parser.add_argument("--alpha", type=float, default=1.0)
    parser.add_argument("--beta_weight", type=float, default=0.0)
    parser.add_argument("--loss_mode", type=str, default="clip")
    parser.add_argument("--lambda_dino", type=float, default=0.0)
    parser.add_argument("--lambda_geom", type=float, default=0.0)
    parser.add_argument("--lambda_graph_near", type=float, default=0.0)
    parser.add_argument("--lambda_graph_far", type=float, default=0.0)
    parser.add_argument("--lambda_hard_neg", type=float, default=0.0)
    parser.add_argument("--lambda_self_align", type=float, default=0.0)
    parser.add_argument("--lambda_sim_align", type=float, default=0.0)
    parser.add_argument("--lambda_weighted_contrastive_loss", type=float, default=0.0)
    parser.add_argument("--graph_near_pct", type=float, default=0.8)
    parser.add_argument("--graph_far_pct", type=float, default=0.2)
    parser.add_argument("--soft_near_pct", type=float, default=0.8)
    parser.add_argument("--soft_far_pct", type=float, default=0.2)
    parser.add_argument("--soft_w_mid", type=float, default=0.2)
    parser.add_argument("--soft_temprature", type=float, default=0.02)  # sic
    parser.add_argument("--dino_far_pct", type=float, default=0.2)
    parser.add_argument("--far_target_percentile", type=float, default=0.75)
    parser.add_argument("--hard_cap_gap", type=float, default=1.0)
    parser.add_argument("--topk_teacher", type=int, default=0)
    parser.add_argument("--topp_teacher", type=float, default=0.0)
    parser.add_argument("--txt_cov_weight", type=float, default=0.0)
    parser.add_argument("--txt_var_weight", type=float, default=0.0)
    parser.add_argument("--txt_top_pct", type=float, default=0.8)
    parser.add_argument("--normalize_rows", default=False, action="store_true")
    parser.add_argument("--normalize_cols", default=False, action="store_true")
    parser.add_argument("--enforce_to_text", default=False, action="store_true")
    parser.add_argument("--use_dino_similarities", default=False, action="store_true")
    parser.add_argument("--use_dino_soft_targets", default=False, action="store_true")
    parser.add_argument("--use_dino_weight", default=False, action="store_true")
    parser.add_argument("--use_dino_self_align", default=False, action="store_true")
    parser.add_argument("--use_dino_sim_align", default=False, action="store_true")
    parser.add_argument("--use_soft_labels", default=False, action="store_true")
    parser.add_argument("--use_symmetric_dino_weights", default=False,
                        action="store_true")
    parser.add_argument("--use-symmetric-dino-weights",
                        dest="use_symmetric_dino_weights", action="store_true",
                        help=argparse.SUPPRESS)  # reference defines both spellings
    parser.add_argument("--vit-lr-decay", dest="vit_lr_decay", type=float,
                        default=0.9)

    # ---- CyCLIP / CoCa / distill ----
    parser.add_argument("--use_CyClip", default=False, action="store_true")
    parser.add_argument("--lambda_cyc_inmodal", type=float, default=0.25)
    parser.add_argument("--lambda_cyc_crossmodal", type=float, default=0.25)
    parser.add_argument("--use_coca", default=False, action="store_true")
    parser.add_argument("--coca-caption-loss-weight", type=float, default=2.0)
    parser.add_argument("--coca-contrastive-loss-weight", type=float, default=1.0)
    parser.add_argument("--distill-model", type=str, default=None)
    parser.add_argument("--distill-pretrained", type=str, default=None)

    # ---- contrastive dist options ----
    parser.add_argument("--local-loss", default=False, action="store_true")
    parser.add_argument("--gather-with-grad", default=False, action="store_true")

    # ---- eval / logging / ckpt ----
    parser.add_argument("--val-frequency", type=int, default=1)
    parser.add_argument("--zeroshot-frequency", type=int, default=2)
    parser.add_argument("--save-frequency", type=int, default=1)
    parser.add_argument("--save-most-recent", default=False, action="store_true")
    parser.add_argument("--delete-previous-checkpoint", default=False, action="store_true")
    parser.add_argument(
        "--compile-cache", type=str, default=None,
        help="directory for JAX's persistent compilation cache; a resumed "
             "run skips the train-step recompile (TPU-native addition)")
    parser.add_argument(
        "--save-on-preemption", default=False, action="store_true",
        help="on SIGTERM (TPU maintenance/preemption), finish the in-flight "
             "step, save a checkpoint recording the mid-epoch position, run "
             "the final remote sync, exit 0. `--resume latest` CONTINUES the "
             "interrupted epoch at the next batch (loaders skip consumed "
             "batches without decoding); a loader that cannot skip redoes "
             "the epoch. Assumes the signal reaches every host (orbax saves "
             "are collective).")
    parser.add_argument(
        "--stop-after-steps", type=int, default=0,
        help="stop the run after N optimizer steps (this process), saving a "
             "mid-epoch checkpoint through the preemption path — for smoke "
             "runs, profiling, and resume tests. 0 = run to completion.")
    parser.add_argument(
        "--async-checkpoint", default=False, action="store_true",
        help="overlap orbax checkpoint writes with training (device arrays "
             "are snapshotted to host, serialization runs in a background "
             "thread; seconds saved per epoch at ViT-H scale). TPU-native "
             "addition — the reference's torch.save blocks the loop.")
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--logs", type=str, default="./logs/")
    parser.add_argument("--log-local", default=False, action="store_true")
    parser.add_argument("--name", type=str, default=None)
    parser.add_argument("--log-every-n-steps", type=int, default=100)
    parser.add_argument("--report-to", type=str, default="")
    parser.add_argument("--wandb-notes", type=str, default="")
    parser.add_argument("--wandb-project-name", type=str, default="open-clip")
    parser.add_argument("--copy-codebase", default=False, action="store_true")
    parser.add_argument("--profile", default=False, action="store_true",
                        help="[tpu] capture a jax.profiler trace of early train steps")
    parser.add_argument("--profile-steps", type=int, default=5)
    parser.add_argument("--debug", default=False, action="store_true")
    parser.add_argument("--run_clip_blind", default=False, action="store_true")
    parser.add_argument("--clip_blind_max_images", type=int, default=2000)
    parser.add_argument("--clip_blind_dino_feats", type=str, default=None,
                        help="DINO feature file for the clip-blind check")
    parser.add_argument("--clip_blind_dino_index_map", type=str, default=None)
    parser.add_argument("--clip_blind_val_key", type=str, default="flickr30k-val")
    parser.add_argument("--clip_blind_train_key", type=str, default="train")
    parser.add_argument("--log-checkpoint", dest="log_checkpoint",
                        default=False, action="store_true",
                        help="upload checkpoints as MLflow artifacts")
    parser.add_argument("--use_mlflow", default=None, action="store_true",
                        help="reference compat; actual gate is MLFLOW_ENABLE env")
    parser.add_argument("--skip-scheduler", dest="skip_scheduler",
                        default=False, action="store_true",
                        help="hold lr constant at --lr (reference params.py:754)")
    parser.add_argument("--pretrained-image", dest="pretrained_image",
                        default=False, action="store_true")
    parser.add_argument("--use-bnb-linear", dest="use_bnb_linear",
                        type=str, default=None)
    parser.add_argument("--remote-sync", type=str, default=None)
    parser.add_argument("--remote-sync-frequency", type=int, default=300)
    parser.add_argument("--remote-sync-protocol", choices=["s3", "fsspec"], default="s3")

    # ---- runtime ----
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument(
        "--device-preprocess", default=False, action="store_true",
        help="TPU-native input path: host workers only decode to uint8; "
             "RandomResizedCrop + normalize run on-device, XLA-fused into "
             "the train step (ops/preprocess.py).",
    )
    parser.add_argument(
        "--device-preprocess-raw-size", type=int, default=256,
        help="Host-side decode size (uint8, square) for --device-preprocess; "
             "kept above the model input size for crop headroom.",
    )
    parser.add_argument("--force-cpu", default=False, action="store_true",
                        help="[tpu] run on host CPU devices (tests/smoke)")
    parser.add_argument("--mesh-model-axis", type=int, default=1,
                        help="[tpu] model-parallel axis size of the (data,model) mesh")
    parser.add_argument("--shard-opt-state", default=False, action="store_true",
                        help="[tpu] ZeRO-1: shard AdamW moments over the data "
                             "axis (per-device optimizer memory / data_size)")
    parser.add_argument("--fsdp", default=False, action="store_true",
                        help="[tpu] ZeRO-3/FSDP: shard the parameters "
                             "themselves over the data axis (XLA all-gathers "
                             "per layer, reduce-scatters grads); implies "
                             "--shard-opt-state. Required for ViT-g-scale "
                             "students on 16 GB chips (BASELINE config 5)")
    parser.add_argument("--fsdp-min-size", type=int, default=2**16,
                        help="[tpu] smallest param (elements) --fsdp shards; "
                             "below this the all-gather latency outweighs "
                             "the memory win")
    parser.add_argument("--attn-impl", type=str, default="auto",
                        choices=["auto", "xla", "flash"],
                        help="[tpu] attention kernel selection")
    parser.add_argument("--dist-url", type=str, default=None)
    parser.add_argument("--dist-backend", type=str, default=None)
    parser.add_argument("--horovod", default=False, action="store_true")
    parser.add_argument("--ddp-static-graph", default=False, action="store_true")
    parser.add_argument("--no-set-device-rank", default=False, action="store_true")

    ns = parser.parse_args(args)

    # model-family default hparams (`params.py:6-12` + main.py wiring)
    defaults = get_default_params(ns.model)
    for name, val in defaults.items():
        if getattr(ns, name) is None:
            setattr(ns, name, val)

    for torch_only in ("torchscript", "torchcompile", "trace", "horovod",
                       "ddp_static_graph", "use_bn_sync", "use_bnb_linear",
                       "pretrained_image"):
        if getattr(ns, torch_only):
            import logging

            logging.warning("flag --%s is torch-specific; ignored on TPU",
                            torch_only.replace("_", "-"))

    # bug-compat: the reference parses these teacher-truncation knobs but no
    # loss ever reads them (`src/open_clip_train/params.py` topk/topp_teacher
    # have zero consumers in `loss.py`); accepted so reference launch scripts
    # keep working, explicitly inert here too
    for parity_only in ("topk_teacher", "topp_teacher"):
        if getattr(ns, parity_only):
            import logging

            logging.warning(
                "flag --%s is parsed for reference-parity but unused (the "
                "reference never consumes it either); no effect", parity_only,
            )

    # reference-vs-native spelling aliases for the retrieval val CSVs
    if ns.flickr30k_val and not ns.flickr_val_data:
        ns.flickr_val_data = ns.flickr30k_val
    if ns.flickr_val_data and not ns.flickr30k_val:
        ns.flickr30k_val = ns.flickr_val_data
    if ns.mscoco_val and not ns.mscoco_val_data:
        ns.mscoco_val_data = ns.mscoco_val
    if ns.mscoco_val_data and not ns.mscoco_val:
        ns.mscoco_val = ns.mscoco_val_data
    return ns
