"""Benchmark: ViT-B/16 DINO-soft fine-tune step throughput on one TPU chip.

This is BASELINE.json's headline metric (`images/sec/chip for ViT-B/16
distill step`). The reference publishes no throughput numbers (SURVEY §6), so
`vs_baseline` is reported against the driver's stated north-star instead:
achieved MFU / 0.50 — a value >= 1.0 means the >=50% MFU target is met.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N, ...extras}
"""

from __future__ import annotations

import json
import time


def _analytic_step_flops(batch: int, cfg=None) -> float:
    """Analytic FLOPs for one CLIP train step (fwd + bwd ≈ 3x fwd).

    Counts matmul FLOPs (2*m*n*k) of both towers; attention included.
    Derived from the model cfg (default ViT-B/16: 197 vision tokens width
    768 x 12, 77 text tokens width 512 x 12). Ignores the small
    DINO-head/loss matmuls.
    """
    def tower_flops(tokens, width, layers, mlp_ratio=4.0):
        per_layer = (
            2 * tokens * width * 3 * width        # qkv proj
            + 2 * tokens * tokens * width * 2     # qk^T and attn @ v
            + 2 * tokens * width * width          # out proj
            + 2 * 2 * tokens * width * (mlp_ratio * width)  # mlp
        )
        return per_layer * layers

    if cfg is None:
        v_tokens, v_width, v_layers, v_mlp = 197, 768, 12, 4.0
        patch_hw = 16 * 16
        t_tokens, t_width, t_layers, t_mlp = 77, 512, 12, 4.0
        embed = 512
    else:
        from refining_clip_via_dinov2_representations_tpu.utils import to_2tuple

        v = cfg.vision_cfg
        tname = getattr(v, "timm_model_name", None)
        if tname:
            # timm-family configs keep ViT-B defaults in vision_cfg (the
            # tower comes from the timm dispatch) — using them here would
            # silently report a wrong MFU. Known transformer towers get
            # their real dims; anything else must be added explicitly.
            from refining_clip_via_dinov2_representations_tpu.models.eva import (
                EVA01_DIMS,
            )

            if tname not in EVA01_DIMS:
                raise SystemExit(
                    f"BENCH_MODEL resolves to timm tower {tname!r} with no "
                    "analytic-FLOPs entry; add its dims to bench.py before "
                    "trusting an MFU number"
                )
            v_width, v_layers, _heads, v_mlp, patch = EVA01_DIMS[tname]
            ih, iw = to_2tuple(v.image_size)
            v_tokens = (ih // patch) * (iw // patch) + 1
            patch_hw = patch * patch
        else:
            v_tokens = v.seq_len  # (H/ph)*(W/pw) + CLS, rectangular-safe
            ph, pw = to_2tuple(v.patch_size)
            patch_hw = ph * pw
            v_width, v_layers, v_mlp = v.width, v.layers, v.mlp_ratio
        t_tokens = cfg.text_cfg.context_length
        t_width, t_layers = cfg.text_cfg.width, cfg.text_cfg.layers
        t_mlp = cfg.text_cfg.mlp_ratio
        embed = cfg.embed_dim

    vision = tower_flops(v_tokens, v_width, v_layers, v_mlp)
    vision += 2 * v_tokens * v_width * (patch_hw * 3)  # patchify
    vision += 2 * v_width * embed  # proj
    text = tower_flops(t_tokens, t_width, t_layers, t_mlp) + 2 * t_width * embed
    fwd = batch * (vision + text)
    return 3.0 * fwd


def _log(msg):
    import sys
    import time as _t

    print(f"[bench {_t.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import os

    import jax

    # BENCH_FORCE_CPU=1: host-CPU smoke mode (the deployment's sitecustomize
    # registers the TPU plugin at interpreter start, so the JAX_PLATFORMS env
    # var alone is too late — pin through the live config)
    if os.environ.get("BENCH_FORCE_CPU", "") not in ("", "0"):
        jax.config.update("jax_platforms", "cpu")

    # persistent compilation cache: the first bench run on a fresh chip pays
    # the (slow, tunneled) compile; later runs in any process reuse it.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from refining_clip_via_dinov2_representations_tpu.losses import DinoLossCfg
    from refining_clip_via_dinov2_representations_tpu.losses.dino import (
        DinoProjectionHead,
    )
    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model,
        get_model_config,
        parse_model_cfg,
    )
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

    backend = jax.default_backend()
    n_chips = jax.device_count()
    # batch sweep on one v5e, round-2 code (img/s/chip, MFU): 96→880 (.550),
    # 128→849 (.531), 160→820 (.513), 192→828 (.518). Round-1 sweep peaked at
    # 96 too (788). 96 avoids XLA's fusion-remat regime while keeping the MXU
    # fed; it is the per-chip microbatch (global batch scales with chips).
    # BENCH_MODEL: any standard-ViT registry config (scaling studies, e.g.
    # ViT-L-14 at BENCH_BATCH=32 → 209.9 img/s, 56.0% MFU); the headline
    # metric stays ViT-B-16@96
    model_name = os.environ.get("BENCH_MODEL", "ViT-B-16")
    batch = int(os.environ.get("BENCH_BATCH", 96))
    # BENCH_TEACHER=1: run the frozen DINOv2 ViT-S/14 teacher INSIDE the step
    # (live-teacher mode, BASELINE configs 2-3) instead of feeding precomputed
    # features; set BENCH_TEACHER to a DINOV2_CONFIGS name for other sizes.
    teacher_env = os.environ.get("BENCH_TEACHER", "")
    # BENCH_REMAT=1: per-block activation checkpointing (BASELINE config 5 —
    # ViT-g-scale student with --grad-checkpointing). BENCH_REMAT_POLICY
    # selects a jax.checkpoint policy (dots_saveable /
    # dots_with_no_batch_dims_saveable) for selective rematerialization.
    use_remat = os.environ.get("BENCH_REMAT", "") not in ("", "0")
    remat_policy = os.environ.get("BENCH_REMAT_POLICY", "")
    remat_arg = (remat_policy or use_remat) if use_remat else False
    # BENCH_MU_DTYPE=bfloat16: AdamW first moment in bf16 (--adam-mu-dtype)
    mu_dtype = os.environ.get("BENCH_MU_DTYPE") or None
    # BENCH_OPT: optimizer family (--opt): adamw | lion | lamb | adafactor |
    # sgd. adafactor's factored second moment saves a params-worth of HBM —
    # the memory lever for giant single-chip points.
    opt_name = os.environ.get("BENCH_OPT", "adamw")
    # BENCH_LOSS=siglip: sigmoid pairwise loss (BASELINE config 4 — the
    # single-chip microbatch of the 32k-global SigLIP step; per-chip compute
    # is loss-dominated-identical across ring impls at world=1)
    loss_kind = os.environ.get("BENCH_LOSS", "dino")
    # BENCH_PRECISION=pure_bf16: params (and hence AdamW moments) stored in
    # bf16 instead of fp32 — the reference's --precision pure_bf16. Removes
    # the fp32→bf16 weight casts feeding every matmul and halves the
    # optimizer update's HBM traffic, at bf16 master-weight accuracy risk.
    precision = os.environ.get("BENCH_PRECISION", "bf16")
    if precision not in ("bf16", "pure_bf16"):
        raise SystemExit(
            f"BENCH_PRECISION={precision!r} not supported (bf16 | pure_bf16)"
        )
    if loss_kind not in ("dino", "siglip"):
        raise SystemExit(
            f"BENCH_LOSS={loss_kind!r} not supported (dino | siglip) — "
            "refusing to record a mislabeled metric"
        )
    if loss_kind == "siglip" and teacher_env not in ("", "0"):
        raise SystemExit(
            "BENCH_TEACHER has no effect on the siglip step (no DINO term); "
            "refusing to record phantom teacher FLOPs"
        )
    dino_dim = 384  # DINOv2 ViT-S/14 feature dim
    _log(
        f"backend={backend} chips={n_chips} model={model_name} batch={batch} "
        f"teacher={teacher_env or 'precomputed'} remat={remat_arg}"
    )

    # BENCH_ATTN: attention impl override (auto|xla|xla_bf16_bwd|fused|flash)
    attn_impl = os.environ.get("BENCH_ATTN", "auto")
    cfg = parse_model_cfg(get_model_config(model_name))
    model = build_model(cfg, dtype=jnp.bfloat16, attn_impl=attn_impl, remat=remat_arg)
    rng = jax.random.PRNGKey(0)
    from refining_clip_via_dinov2_representations_tpu.utils import to_2tuple

    img_h, img_w = to_2tuple(cfg.vision_cfg.image_size)
    ctx = cfg.text_cfg.context_length
    images = jnp.zeros((batch, img_h, img_w, 3), jnp.bfloat16)
    texts = jnp.zeros((batch, ctx), jnp.int32)
    _log("init params...")
    variables = jax.jit(model.init)(rng, images, texts)
    jax.block_until_ready(variables)
    if precision == "pure_bf16":
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            variables,
        )
    _log("init done")

    dino_teacher = None
    teacher_flops = 0.0
    teacher_split = False
    if teacher_env not in ("", "0"):
        from refining_clip_via_dinov2_representations_tpu.models.dinov2 import (
            DINOV2_CONFIGS,
            Dinov2,
            Dinov2Cfg,
        )
        from refining_clip_via_dinov2_representations_tpu.train.dino_teacher import (
            LiveDinoTeacher,
        )

        if teacher_env not in ("1", "true") and teacher_env not in DINOV2_CONFIGS:
            raise SystemExit(
                f"BENCH_TEACHER={teacher_env!r} is not a known DINOv2 config "
                f"({sorted(DINOV2_CONFIGS)}); refusing to silently bench the "
                "small teacher under a different label"
            )
        tname = teacher_env if teacher_env in DINOV2_CONFIGS else "facebook/dinov2-small"
        t_hidden, t_layers, t_heads, t_swiglu = DINOV2_CONFIGS[tname]
        tcfg = Dinov2Cfg(
            hidden_size=t_hidden, layers=t_layers, heads=t_heads,
            use_swiglu_ffn=t_swiglu,
        )
        # BENCH_TEACHER_ATTN: attention impl for the frozen teacher forward
        # (no backward exists, so the Pallas kernel's grad regression at
        # short L does not apply — candidate win at the teacher's L=257)
        t_attn = os.environ.get("BENCH_TEACHER_ATTN", "xla")
        tmodel = Dinov2(cfg=tcfg, dtype=jnp.bfloat16, attn_impl=t_attn)
        # random weights: identical compute/perf to real ones (zero-egress
        # bench host cannot fetch the HF checkpoint; training uses real ones)
        tvars = jax.jit(tmodel.init)(
            jax.random.PRNGKey(2), jnp.zeros((1, img_h, img_w, 3), jnp.bfloat16)
        )
        dino_teacher = LiveDinoTeacher(tmodel, tvars)
        teacher_vars = tvars
        dino_dim = t_hidden
        # BENCH_TEACHER_SPLIT=1: compile the frozen teacher forward as its
        # own jit and chain its output into the train step instead of fusing
        # it into one XLA program. Needed for the big-teacher configs
        # (ViT-L student + dinov2-large): the axon tunnel drops any single
        # remote_compile after ~30 min, and the fused program exceeds that.
        # Perf accounting is identical (teacher FLOPs stay in the MFU
        # denominator; the loop pipelines both programs, one closing fetch).
        teacher_split = os.environ.get("BENCH_TEACHER_SPLIT", "") not in ("", "0")
        # frozen forward only (no bwd): 1x tower FLOPs at the teacher's
        # patch-14 sequence length
        t_h = (img_h // tcfg.patch_size) * tcfg.patch_size
        t_tokens = (t_h // tcfg.patch_size) ** 2 + 1
        per_layer = (
            2 * t_tokens * t_hidden * 3 * t_hidden
            + 2 * t_tokens * t_tokens * t_hidden * 2
            + 2 * t_tokens * t_hidden * t_hidden
            + 2 * 2 * t_tokens * t_hidden * 4.0 * t_hidden
        )
        teacher_flops = batch * (
            per_layer * t_layers
            + 2 * t_tokens * t_hidden * (tcfg.patch_size ** 2 * 3)
        )
        _log(f"live teacher {tname}: {t_tokens} tokens, dim {t_hidden}")

    if loss_kind == "siglip":
        head = head_params = None
        params = {"model": variables["params"]}
        tx, _ = build_optimizer(params, OptimCfg(opt=opt_name, lr=5e-4, mu_dtype=mu_dtype), cosine_lr(5e-4, 100, 10000))
        state = create_train_state(rng, variables["params"], tx)
        step_cfg = StepCfg(loss_type="siglip")
    else:
        head = DinoProjectionHead(dino_dim=dino_dim, projection_type="mlp")
        head_params = head.init(jax.random.PRNGKey(1), jnp.zeros((1, cfg.embed_dim)))[
            "params"
        ]
        if precision == "pure_bf16":
            head_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16), head_params
            )
        params = {"model": variables["params"], "dino_head": head_params}
        tx, _ = build_optimizer(params, OptimCfg(opt=opt_name, lr=5e-4, mu_dtype=mu_dtype), cosine_lr(5e-4, 100, 10000))
        state = create_train_state(rng, variables["params"], tx, head_params)
        step_cfg = StepCfg(
            loss_type="dino",
            dino=DinoLossCfg(lambda_soft=0.5, soft_mode="kl_teacher", lambda_weighted=0.2),
        )
    # teacher weights must thread as jit ARGUMENTS: closure capture bakes
    # them into the program as HLO literals (~1.2 GB for dinov2-large, which
    # alone exceeds the tunnel's remote_compile upload window)
    teacher_fn = None
    frozen = None
    if dino_teacher is not None and teacher_split:
        teacher_fn = jax.jit(
            lambda tv, im: dino_teacher.extract(im, variables=tv)
        )
    elif dino_teacher is not None:
        frozen = {"dino_teacher": teacher_vars}
    train_step = make_train_step(
        model, tx, step_cfg, head=head,
        dino_teacher=None if teacher_fn is not None else dino_teacher,
    )

    npr = np.random.default_rng(0)
    batch_data = {
        "images": jnp.asarray(npr.normal(size=(batch, img_h, img_w, 3)), jnp.bfloat16),
        "texts": jnp.asarray(npr.integers(1, min(49407, cfg.text_cfg.vocab_size - 1), size=(batch, ctx)), jnp.int32),
    }
    if loss_kind != "siglip" and dino_teacher is None:
        batch_data["dino_features"] = jnp.asarray(
            npr.normal(size=(batch, dino_dim)), jnp.float32
        )

    # warmup / compile. NOTE: timing must end on a VALUE FETCH — on the
    # tunneled axon backend `block_until_ready` returns before execution
    # completes; fetching the final loss forces the whole chained computation.
    # The persistent-cache file count before/after distinguishes a cache hit
    # (compile_s ~ seconds: deserialization only) from a miss (minutes over
    # the tunnel) — recorded in the JSON so round-over-round compile-time
    # swings are self-explaining.
    cache_files_before = len(list(os.scandir(cache_dir)))
    _log("compiling train step...")
    t_compile = time.perf_counter()
    for i in range(2):
        if teacher_fn is not None:
            batch_data["dino_features"] = teacher_fn(teacher_vars, batch_data["images"])
        state, metrics = train_step(state, batch_data, frozen)
        _log(f"warmup step {i} done, loss={float(metrics['total_loss']):.4f}")
    compile_s = time.perf_counter() - t_compile
    cache_miss = len(list(os.scandir(cache_dir))) > cache_files_before

    # Window design (r5 measurement study): the chip ramps for ~10-15 s after
    # the compile/warmup — a 5x100-step run on the same HEAD read 832.8 on
    # window 0 and then 884.0/884.2/884.5/885.2 (steady to ±0.1%). r04's
    # single 30-step window right after warmup caught that ramp and recorded
    # 859 as a phantom regression. So: (a) BENCH_RAMP_STEPS untimed steps
    # first, (b) 100-step windows (amortize the ~35 ms tunnel fetch to
    # ~0.3%), (c) BENCH_REPEATS windows (default 3) with the MEDIAN as the
    # headline — any residual ramp window lands at the bottom and is
    # discarded by construction.
    n_steps = int(os.environ.get("BENCH_STEPS", 100))
    n_repeats = max(1, int(os.environ.get("BENCH_REPEATS", 3)))
    ramp_steps = int(os.environ.get("BENCH_RAMP_STEPS", 30))
    for _ in range(ramp_steps):
        if teacher_fn is not None:
            batch_data["dino_features"] = teacher_fn(teacher_vars, batch_data["images"])
        state, metrics = train_step(state, batch_data, frozen)
    float(metrics["total_loss"])  # fetch: drain the ramp before timing
    window_ips = []
    for w in range(n_repeats):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            if teacher_fn is not None:
                # split mode: re-run the teacher forward every step (its cost
                # is part of the measured step; the loop pipelines both)
                batch_data["dino_features"] = teacher_fn(teacher_vars, batch_data["images"])
            state, metrics = train_step(state, batch_data, frozen)
        float(metrics["total_loss"])  # sync point: forces the whole window
        dt = time.perf_counter() - t0
        window_ips.append(batch / (dt / n_steps) / n_chips)
        _log(f"window {w}: {window_ips[-1]:.2f} img/s/chip")

    window_ips.sort()
    ips = window_ips[len(window_ips) // 2]  # median (windows are few and odd by default)
    if len(window_ips) % 2 == 0:
        ips = (ips + window_ips[len(window_ips) // 2 - 1]) / 2
    spread_pct = (window_ips[-1] - window_ips[0]) / ips * 100 if ips else 0.0
    step_time = batch / (ips * n_chips)

    flops = _analytic_step_flops(batch, cfg) + teacher_flops
    peak = {"tpu": 197e12, "cpu": 1e12}.get(backend, 100e12)  # v5e bf16 peak
    mfu = flops / step_time / (peak * n_chips)

    print(
        json.dumps(
            {
                "metric": (
                    ("vitb16" if model_name == "ViT-B-16" else model_name)
                    + ("_dino_soft" if loss_kind == "dino" else f"_{loss_kind}")
                    + "_train_images_per_sec_per_chip"
                    + ("_live_teacher" if dino_teacher is not None else "")
                    + ("_remat" if use_remat else "")
                    + ("" if opt_name == "adamw" else f"_{opt_name}")
                    + ("" if precision == "bf16" else f"_{precision}")
                ),
                "value": round(ips, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(mfu / 0.50, 4),
                "mfu": round(mfu, 4),
                "step_time_ms": round(step_time * 1e3, 2),
                "batch": batch,
                "backend": backend,
                "chips": n_chips,
                "opt": opt_name,
                "precision": precision,
                "mu_dtype": mu_dtype
                or ("bfloat16" if precision == "pure_bf16" else "float32"),
                "loss": round(float(metrics["total_loss"]), 4),
                "windows": [round(w, 2) for w in window_ips],
                "spread_pct": round(spread_pct, 2),
                "compile_s": round(compile_s, 1),
                "compile_cache": "miss" if cache_miss else "hit",
            }
        )
    )


if __name__ == "__main__":
    main()
