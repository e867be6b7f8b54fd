"""XLA:TPU compiler-option sweep over the train-step jit (VERDICT r4 #6a).

Runs `bench.py` once per option set via `REFINING_CLIP_XLA_OPTS` (the
per-jit `compiler_options` knob, `train/step.py:_step_compiler_options`)
and records the headline img/s + MFU for each. Each distinct option set is
a fresh XLA cache key, so expect one cold compile (~2-10 min through the
tunnel) per point; the persistent cache makes re-runs instant.

Points are chosen for a single-chip v5e ViT-B step whose profile is 84.8%
MXU fusions (README "Measured"): scoped-vmem headroom (bigger operand
staging for the matmul tiler) and the latency-hiding scheduler (overlap
HBM prefetch with compute inside fusions).

Usage: python scripts/sweep_xla_opts.py [--points N] [--out FILE]
Runs SERIALLY — never start while anything else owns the chip.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Each entry: (label, REFINING_CLIP_XLA_OPTS value). "" = XLA defaults
# (the measured design point, re-run as the control for this sweep's
# session so every comparison is same-session).
POINTS = [
    ("default", ""),
    ("vmem64m", "xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem96m", "xla_tpu_scoped_vmem_limit_kib=98304"),
    ("lhs", "xla_tpu_enable_latency_hiding_scheduler=true"),
    ("vmem64m+lhs",
     "xla_tpu_scoped_vmem_limit_kib=65536,"
     "xla_tpu_enable_latency_hiding_scheduler=true"),
]


def run_point(label: str, opts: str, env_extra=None):
    env = dict(os.environ)
    env["REFINING_CLIP_XLA_OPTS"] = opts
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    if env_extra:
        env.update(env_extra)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    wall = time.time() - t0
    line = None
    for ln in proc.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{") and '"metric"' in ln:
            line = json.loads(ln)
    if line is None:
        print(f"[{label}] FAILED ({wall:.0f}s)\n--- stdout\n{proc.stdout[-2000:]}"
              f"\n--- stderr\n{proc.stderr[-2000:]}", file=sys.stderr, flush=True)
        return {"label": label, "opts": opts, "error": proc.returncode,
                "wall_s": round(wall, 1)}
    rec = {"label": label, "opts": opts,
           "img_per_s": line["value"], "mfu": line.get("mfu"),
           "step_ms": line.get("step_time_ms"),
           "spread_pct": line.get("spread_pct"),
           "compile_s": line.get("compile_s"),
           "compile_cache": line.get("compile_cache"),
           "wall_s": round(wall, 1)}
    print(f"[{label}] {rec['img_per_s']} img/s  mfu={rec['mfu']}  "
          f"step={rec['step_ms']}ms  spread={rec['spread_pct']}%  "
          f"compile={rec['compile_s']}s ({rec['compile_cache']})",
          file=sys.stderr, flush=True)
    return rec


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/xla_opts_sweep.json")
    p.add_argument("--only", nargs="*", help="run only these labels")
    a = p.parse_args(argv)
    points = [pt for pt in POINTS if not a.only or pt[0] in a.only]
    rows = [run_point(label, opts) for label, opts in points]
    with open(a.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
