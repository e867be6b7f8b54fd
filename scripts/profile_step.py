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

    # aggregate
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True), key=os.path.getmtime)
    assert paths, "no trace found"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # find TPU pids (process_name metadata mentioning TPU or /device)
    tpu_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            n = e.get("args", {}).get("name", "")
            if "TPU" in n or "tpu" in n:
                tpu_pids.add(e["pid"])
    durs = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            name = e.get("name", "?")
            d = float(e.get("dur", 0.0))
            durs[name] += d
            counts[name] += 1
            total += d
    items = sorted(durs.items(), key=lambda kv: -kv[1])
    print(f"TPU pids {tpu_pids}; total device time {total/1e3:.2f} ms over 5 steps -> {total/5e3:.2f} ms/step")
    print(f"{'op':<72} {'ms/step':>9} {'count':>6} {'%':>6}")
    for name, d in items[:45]:
        print(f"{name[:72]:<72} {d/5e3:9.3f} {counts[name]//5:6d} {100*d/total:6.2f}")

    # category rollup
    cats = defaultdict(float)
    for name, d in durs.items():
        ln = name.lower()
        if "fusion" in ln and ("conv" in ln or "dot" in ln):
            cats["matmul-fusion"] += d
        elif ln.startswith("fusion") or ".fusion" in ln:
            cats["elementwise-fusion"] += d
        elif "copy" in ln or "transpose" in ln:
            cats["copy/transpose"] += d
        elif "reduce" in ln:
            cats["reduce"] += d
        else:
            cats["other"] += d
    print("\ncategory rollup (ms/step):")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {k:<22} {v/5e3:8.2f}")


if __name__ == "__main__":
    main()
