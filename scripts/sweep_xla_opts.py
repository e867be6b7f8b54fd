"""VERDICT-r4 #6a: measure `REFINING_CLIP_XLA_OPTS` compiler-knob candidates.

Runs `bench.py` once per option set (subprocess — per-compile options are
baked into the jit at trace time, so each set needs a fresh process) and
records every result, including rejected option names, to
`docs/xla_opts_sweep_r5.json`. Each new option set is an XLA-executable
cache MISS by construction (options key the cache), so expect a tunneled
compile per row; the JSON's `compile_s` field separates compile cost from
the measured throughput.

Usage: python scripts/sweep_xla_opts.py [--steps 50] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Candidate sets. Single-chip train step: no collectives, so the levers are
# scoped-vmem headroom (bigger fusion tiles before spill) and scheduling.
CANDIDATES = [
    ("baseline", ""),
    ("vmem_64m", "xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem_96m", "xla_tpu_scoped_vmem_limit_kib=98304"),
    ("lhs", "xla_tpu_enable_latency_hiding_scheduler=true"),
    (
        "vmem_96m_lhs",
        "xla_tpu_scoped_vmem_limit_kib=98304,"
        "xla_tpu_enable_latency_hiding_scheduler=true",
    ),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "xla_opts_sweep_r5.json"))
    ap.add_argument("--only", default="", help="comma list of candidate names")
    args = ap.parse_args()

    only = {s for s in args.only.split(",") if s}
    rows = []
    for name, opts in CANDIDATES:
        if only and name not in only:
            continue
        env = dict(os.environ)
        env["BENCH_STEPS"] = str(args.steps)
        env["BENCH_REPEATS"] = str(args.repeats)
        if opts:
            env["REFINING_CLIP_XLA_OPTS"] = opts
        else:
            env.pop("REFINING_CLIP_XLA_OPTS", None)
        print(f"=== {name}: {opts or '(none)'}", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=3600,
        )
        row = {"name": name, "opts": opts}
        line = next(
            (ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")), None
        )
        if proc.returncode == 0 and line:
            row.update(json.loads(line))
        else:
            row["error"] = (proc.stderr or proc.stdout).strip()[-2000:]
        rows.append(row)
        print(json.dumps(row)[:400], flush=True)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
