"""Serving-engine benchmark: encode throughput/latency on one TPU chip.

Measures `inference.ClipInferenceEngine` (the production serving path:
bucketed static shapes, AOT-compiled, optional weight-only int8) for the
flagship ViT-B-16 at several batch sizes, bf16 vs int8.

Two numbers per point:
  * device img/s  — pipelined jitted calls, one closing value fetch
    (device-throughput ceiling; how bench.py times training too);
  * e2e img/s     — through `engine.encode_image` (includes host pad /
    bucket / per-call result fetch). On this axon-tunneled chip every
    fetch pays ~35 ms RTT that a co-located production host would not,
    so e2e here is a LOWER bound.

Usage: python scripts/bench_serving.py [--quantize int8] [--model ViT-B-16]
Prints one JSON line per (tower, batch) point.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _log(msg):
    print(f"[serve-bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B-16")
    ap.add_argument("--quantize", default=None, choices=[None, "int8"])
    ap.add_argument("--buckets", default="8,32,128,256")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--caption", action="store_true",
                    help="bench CoCa beam-search captioning: KV-cached "
                         "incremental decode vs full re-decode "
                         "(use --model coca_ViT-B-32)")
    ap.add_argument("--seq-len", type=int, default=30)
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from refining_clip_via_dinov2_representations_tpu.inference import (
        ClipInferenceEngine,
    )
    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model,
        get_model_config,
        parse_model_cfg,
    )
    from refining_clip_via_dinov2_representations_tpu.utils import to_2tuple

    buckets = [int(b) for b in args.buckets.split(",")]
    cfg = parse_model_cfg(get_model_config(args.model))
    model = build_model(cfg, dtype=jnp.bfloat16)
    img_h, img_w = to_2tuple(cfg.vision_cfg.image_size)
    ctx = cfg.text_cfg.context_length
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, img_h, img_w, 3), jnp.bfloat16),
        jnp.zeros((1, ctx), jnp.int32),
    )
    _log(f"model={args.model} quantize={args.quantize} buckets={buckets}")

    npr0 = np.random.default_rng(0)
    if args.caption:
        from refining_clip_via_dinov2_representations_tpu.models.coca import (
            generate_beam,
        )

        for b in buckets:
            imgs = jnp.asarray(
                npr0.normal(size=(b, img_h, img_w, 3)), jnp.bfloat16
            )
            for label, uc in (("cached", True), ("full", False)):
                fn = jax.jit(
                    lambda v, im, uc=uc: generate_beam(
                        model, v, im, seq_len=args.seq_len, use_cache=uc
                    )
                )
                _log(f"caption batch={b} {label}: compiling...")
                out = fn(variables, imgs)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                iters = max(3, args.steps // 6)
                for _ in range(iters):
                    out = fn(variables, imgs)
                _ = np.asarray(out)
                dt = (time.perf_counter() - t0) / iters
                print(json.dumps({
                    "mode": f"caption_{label}",
                    "batch": b,
                    "seq_len": args.seq_len,
                    "device_items_per_s": round(b / dt, 1),
                    "device_ms": round(dt * 1e3, 2),
                }), flush=True)
        return

    engine = ClipInferenceEngine(
        model, variables, image_size=(img_h, img_w), context_length=ctx,
        buckets=buckets, quantize=args.quantize,
    )
    _log("warmup (AOT-compiling every bucket)...")
    engine.warmup()
    _log("warmup done")

    npr = np.random.default_rng(0)
    for b in buckets:
        imgs = npr.normal(size=(b, img_h, img_w, 3)).astype(np.float32)
        txts = npr.integers(
            1, cfg.text_cfg.vocab_size - 1, size=(b, ctx)
        ).astype(np.int32)
        for tower, fn_jit, data in (
            ("image", engine._encode_image, jnp.asarray(imgs)),
            ("text", engine._encode_text, jnp.asarray(txts)),
        ):
            # device throughput: pipelined, fetch once at the end
            out = fn_jit(engine.variables, data)  # warm this shape
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = fn_jit(engine.variables, data)
            _ = np.asarray(out)  # sync: value fetch (tunnel-safe)
            dt_dev = (time.perf_counter() - t0) / args.steps

            # e2e engine path (pad/bucket/fetch each call)
            public = engine.encode_image if tower == "image" else engine.encode_text
            host = imgs if tower == "image" else txts
            public(host)  # warm
            t0 = time.perf_counter()
            e2e_iters = max(5, args.steps // 3)
            for _ in range(e2e_iters):
                public(host)
            dt_e2e = (time.perf_counter() - t0) / e2e_iters

            print(json.dumps({
                "tower": tower,
                "batch": b,
                "quantize": args.quantize or "bf16",
                "device_items_per_s": round(b / dt_dev, 1),
                "device_ms": round(dt_dev * 1e3, 2),
                "e2e_items_per_s": round(b / dt_e2e, 1),
                "e2e_ms": round(dt_e2e * 1e3, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
