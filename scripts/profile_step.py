"""Profile the ViT-B/16 DINO-soft train step on TPU and aggregate op times.

Usage: python scripts/profile_step.py [batch]
Writes the trace under /tmp/step_trace and prints the top-k ops by total
duration (TPU pid only), plus category rollups.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 96

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from refining_clip_via_dinov2_representations_tpu.losses import DinoLossCfg
    from refining_clip_via_dinov2_representations_tpu.losses.dino import DinoProjectionHead
    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model, get_model_config, parse_model_cfg,
    )
    from refining_clip_via_dinov2_representations_tpu.train.optim import OptimCfg, build_optimizer
    from refining_clip_via_dinov2_representations_tpu.train.scheduler import cosine_lr
    from refining_clip_via_dinov2_representations_tpu.train.step import (
        StepCfg, create_train_state, make_train_step,
    )

    cfg = parse_model_cfg(get_model_config("ViT-B-16"))
    model = build_model(cfg, dtype=jnp.bfloat16, attn_impl="auto")
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((batch, 224, 224, 3), jnp.bfloat16)
    texts = jnp.zeros((batch, 77), jnp.int32)
    variables = jax.jit(model.init)(rng, images, texts)
    head = DinoProjectionHead(dino_dim=384, projection_type="mlp")
    head_params = head.init(jax.random.PRNGKey(1), jnp.zeros((1, cfg.embed_dim)))["params"]
    params = {"model": variables["params"], "dino_head": head_params}
    tx, _ = build_optimizer(params, OptimCfg(lr=5e-4), cosine_lr(5e-4, 100, 10000))
    state = create_train_state(rng, variables["params"], tx, head_params)
    step_cfg = StepCfg(loss_type="dino", dino=DinoLossCfg(lambda_soft=0.5, soft_mode="kl_teacher", lambda_weighted=0.2))
    train_step = make_train_step(model, tx, step_cfg, head=head)

    npr = np.random.default_rng(0)
    bd = {
        "images": jnp.asarray(npr.normal(size=(batch, 224, 224, 3)), jnp.bfloat16),
        "texts": jnp.asarray(npr.integers(1, 49407, size=(batch, 77)), jnp.int32),
        "dino_features": jnp.asarray(npr.normal(size=(batch, 384)), jnp.float32),
    }
    for _ in range(2):
        state, metrics = train_step(state, bd)
    float(metrics["total_loss"])
    print("warm, tracing...", file=sys.stderr)

    trace_dir = "/tmp/step_trace"
    jax.profiler.start_trace(trace_dir)
    for _ in range(5):
        state, metrics = train_step(state, bd)
    float(metrics["total_loss"])
    jax.profiler.stop_trace()

    # aggregate over the "XLA Ops" thread only (leaf op events). Summing all
    # TPU-pid events double-counts: the trace also carries "Steps" and
    # "XLA Modules" parent spans covering the same wall time.
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True), key=os.path.getmtime)
    assert paths, "no trace found"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    ops_tid = None
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e["args"].get("name") == "XLA Ops"):
            ops_tid = (e["pid"], e["tid"])
    assert ops_tid, "no 'XLA Ops' thread in trace"
    durs = defaultdict(float)
    counts = defaultdict(int)
    cats = defaultdict(float)
    args_by_name = {}
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) == ops_tid:
            name = e.get("name", "?")
            d = float(e.get("dur", 0.0))
            a = e.get("args", {})
            durs[name] += d
            counts[name] += 1
            args_by_name[name] = a
            cats[a.get("hlo_category", "?")] += d
            total += d
    print(f"XLA Ops device time {total/1e3:.2f} ms over 5 steps -> {total/5e3:.2f} ms/step")
    print("\nby hlo_category (ms/step):")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        if v / total > 0.001:
            print(f"  {k:<36} {v/5e3:8.2f}  {100*v/total:5.1f}%")
    print(f"\n{'op':<40} {'ms/step':>9} {'count':>6} {'%':>6}  category")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
        cat = args_by_name[name].get("hlo_category", "?")
        print(f"{name[:40]:<40} {d/5e3:9.3f} {counts[name]//5:6d} {100*d/total:6.2f}  {cat}")


if __name__ == "__main__":
    main()
