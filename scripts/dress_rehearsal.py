"""Offline quality-parity dress rehearsal (VERDICT r4 next-round #2).

Runs the FULL thesis protocol in BOTH stacks — the torch reference
(`/root/reference/src/open_clip_train/main.py`, driven in-process on CPU via
tests/ref_loader + the functional torchvision stand-in) and this rebuild
(`refining_clip_via_dinov2_representations_tpu/train/main.py`) — from the
SAME torch-initialized checkpoint on the same deterministic procedural
mini-Flickr dataset (scripts/mini_flickr.py), then compares end to end:

1. epoch-0 pre-train retrieval eval  — must match TIGHTLY (same converted
   init + same eval pipeline; any drift = conversion/preprocess/metric bug)
2. N epochs of DINO-soft fine-tune   — loss trajectories recorded
3. final retrieval eval              — tolerance-compared (data order and
   augmentation RNG legitimately differ between the stacks)
4. CLIP-blind pair stats (val+train) — tolerance-compared
5. the §2.4 offline suite (feature extract -> kNN -> geometry -> linear
   probe) on each stack's own final checkpoint — tolerance-compared

This closes the gap 50-step loss overlays can't: optimizer grouping x
schedule x data pipeline x eval pipeline, full lifecycle, on real(istic)
images. Exit code 0 = every metric pair within its stated tolerance.

Usage: python scripts/dress_rehearsal.py [--workdir DIR] [--epochs N]
                                         [--n-train N] [--n-val N]
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

MINI_CFG = {
    "embed_dim": 64,
    "vision_cfg": {
        "image_size": 64, "patch_size": 16, "width": 64, "layers": 3,
        "head_width": 16,
    },
    "text_cfg": {
        "context_length": 32, "vocab_size": 49408, "width": 64, "heads": 4,
        "layers": 3,
    },
}

# pre-train eval runs the SAME weights through both eval pipelines; recalls
# are exact-equal in practice (same ranked lists) — the loose-ish bound only
# absorbs fp32 reduction-order noise near rank boundaries on other hosts.
EPOCH0_TOL = 0.51          # percentage points on recalls; ranks in units
EPOCH0_SCALAR_TOL = 2e-3   # modality gap / average similarity / val loss
# post-training: the stacks legitimately differ in data order + aug RNG, so
# the bound is statistical, not numerical.
FINAL_RECALL_TOL = 15.0    # percentage points per recall metric
FINAL_RMEAN_TOL = 8.0      # percentage points on the 6-recall mean
BLIND_TOL = 12.0           # percentage points on relative blind-pair %
KNN_TOL = 0.12             # kNN / linear-probe top-1 (fraction)
# geometry functionals of two INDEPENDENTLY-trained runs are the noisiest
# comparisons here (measured across configs: |Δ| up to ~0.16 while retrieval
# agrees to 1.5 points); the offline_cross section holds the tight
# same-weights pipeline bound instead
GEOM_UNIFORMITY_TOL = 0.20  # E[exp(-t d^2)] value in (0, 1]
ANISO_TOL = 0.20           # PC1 energy fraction


def _install_ref_env():
    os.environ.setdefault("MPLBACKEND", "Agg")
    import torch

    if not hasattr(torch.Tensor, "_dress_pin_patched"):
        # CPU-only hosts: torch.Tensor.pin_memory raises without an
        # accelerator; the reference calls it unconditionally
        # (main.py:699). Identity is semantics-preserving on CPU.
        torch.Tensor.pin_memory = lambda self, *a, **k: self
        torch.Tensor._dress_pin_patched = True


def prepare(workdir, n_train=160, n_val=40, seed=0, dino_dim=64):
    """Dataset + shared torch init checkpoint. Returns a context dict."""
    _install_ref_env()
    import torch

    from scripts.mini_flickr import generate
    from tests.ref_loader import load_ref

    data = generate(
        os.path.join(workdir, "data"), n_train=n_train, n_val=n_val,
        size_px=MINI_CFG["vision_cfg"]["image_size"], dino_dim=dino_dim,
        seed=seed,
    )

    cfg_dir = os.path.join(workdir, "cfg")
    os.makedirs(cfg_dir, exist_ok=True)
    cfg_path = os.path.join(cfg_dir, "mini-dress.json")
    with open(cfg_path, "w") as f:
        json.dump(MINI_CFG, f)

    factory = load_ref("factory")
    if "mini-dress" not in factory.list_models():
        factory.add_model_config(cfg_path)
    from refining_clip_via_dinov2_representations_tpu.models import (
        register_model_config,
    )

    register_model_config("mini-dress", MINI_CFG)

    init_path = os.path.join(workdir, "init.pt")
    torch.manual_seed(seed)
    model = factory.create_model("mini-dress", precision="fp32", device="cpu")
    torch.save({"state_dict": model.state_dict()}, init_path)
    return {"data": data, "init": init_path, "workdir": workdir, "seed": seed,
            "cfg_path": cfg_path}


def _common_flags(ctx, epochs):
    d = ctx["data"]
    return [
        "--model", "mini-dress", "--pretrained", ctx["init"],
        "--train-data", d["train_csv"], "--val-data", d["val_csv"],
        "--dataset-type", "csv", "--csv-separator", ",",
        "--csv-img-key", "filepath", "--csv-caption-key", "title",
        "--batch-size", "20", "--epochs", str(epochs),
        "--lr", "5e-4", "--warmup", "2", "--wd", "0.1",
        "--precision", "fp32", "--workers", "1", "--seed", str(ctx["seed"]),
        "--use_dino_general", "--lambda_soft", "0.5",
        "--soft_mode", "kl_teacher", "--lambda_weighted", "0.2",
        "--dino_fts_path", d["dino_feats"],
        "--dino_index_map_path", d["dino_index_map"],
        # the factor-features cover train AND val rows in one store, so the
        # val-split CLIP-blind check reuses the same artifacts
        "--dino_fts_path_val", d["dino_feats"],
        "--dino_index_map_path_val", d["dino_index_map"],
        "--run_clip_blind", "--clip_blind_val_key", "val",
        "--log-checkpoint",  # reference only writes epoch ckpts when set
    ]


def run_reference(ctx, epochs):
    _install_ref_env()
    from tests.ref_loader import load_ref_train

    logs = os.path.join(ctx["workdir"], "ref_logs")
    main_mod = load_ref_train("main")
    main_mod.main(_common_flags(ctx, epochs) + ["--logs", logs, "--name", "run"])
    return os.path.join(logs, "run")


def run_tpu(ctx, epochs):
    """Run our train CLI in a SUBPROCESS pinned to ONE CPU device.

    In-process would inherit the caller's jax topology — under the test
    suite that is an 8-virtual-device mesh, which turns `--batch-size 20`
    (per-device) into global batch 160 and shards the eval loss pool,
    diverging from the reference's single-device batch-20 run for reasons
    that have nothing to do with parity.
    """
    import re
    import subprocess

    logs = os.path.join(ctx["workdir"], "jax_logs")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", ""),
    ).strip()
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    bootstrap = (
        "import json, sys\n"
        "from refining_clip_via_dinov2_representations_tpu.models import "
        "register_model_config\n"
        f"register_model_config('mini-dress', json.load(open({ctx['cfg_path']!r})))\n"
        "from refining_clip_via_dinov2_representations_tpu.train.main import main\n"
        "main(sys.argv[1:])\n"
    )
    flags = _common_flags(ctx, epochs) + [
        # --flatten-group-lrs: the reference's scheduler overwrites the
        # 5-group per-group LRs with cosine(args.lr) every step
        # (scheduler.py:45-63 writes one LR into every param group); the
        # rebuild's default fixes that quirk, so bug-compatible mode is
        # REQUIRED for dynamics parity with the reference run.
        "--flatten-group-lrs", "--logs", logs, "--name", "run", "--force-cpu",
    ]
    subprocess.run(
        [sys.executable, "-c", bootstrap] + flags, env=env, check=True,
        cwd=REPO_ROOT,
    )
    return os.path.join(logs, "run")


# ---------------------------------------------------------------------------
# metric harvesting
# ---------------------------------------------------------------------------

def load_itm_results(run_dir):
    """{epoch: {metric: value}} from final_itm_results.json (either layout:
    ours at the run root, the reference's under checkpoints/)."""
    for cand in (
        os.path.join(run_dir, "final_itm_results.json"),
        os.path.join(run_dir, "checkpoints", "final_itm_results.json"),
    ):
        if os.path.exists(cand):
            with open(cand) as f:
                rows = json.load(f)
            out = {}
            for row in rows:
                for r in row.get("results", []):
                    if r.get("val_name") == "val":
                        out[int(row["epoch"])] = r["metrics"]
            return out
    raise FileNotFoundError(f"no final_itm_results.json under {run_dir}")


def load_clip_blind(run_dir):
    """{split: {'clip≥c_dino≤d': relative_percent}} — both stacks write the
    same stats structure (`helpers.py:221-285` / eval/clip_blind.pair_stats);
    only the artifact layout differs (reference:
    checkpoints/clip_blind/<split>/clip_blind_stats.json, ours:
    clip_blind/clip_blind_<split>.json)."""
    out = {}
    for path in glob.glob(
        os.path.join(run_dir, "**", "clip_blind*.json"), recursive=True
    ):
        with open(path) as f:
            stats = json.load(f)
        if not isinstance(stats, dict) or "results" not in stats:
            continue
        base = os.path.basename(path)
        if base.startswith("clip_blind_stats"):  # reference layout
            split = os.path.basename(os.path.dirname(path))
        else:  # ours: clip_blind_<split>.json
            split = base[len("clip_blind_"):-len(".json")]
        out[split] = {
            key: float(v["relative_percent"])
            for key, v in stats["results"].items()
        }
    return out


def offline_suite_reference(ctx, run_dir, epochs):
    """Reference test_scripts pipeline on the reference's final checkpoint."""
    _install_ref_env()
    import importlib.util

    from tests.ref_loader import _ensure_pkg

    _ensure_pkg()

    def load_script(name):
        spec = importlib.util.spec_from_file_location(
            f"ref_ts_{name}", f"/root/reference/test_scripts/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    ckpt = os.path.join(run_dir, "checkpoints", f"epoch_{epochs}.pt")
    ex = load_script("extract_features_from_csv")
    outs = {}
    for split in ("train", "val"):
        out_pt = os.path.join(ctx["workdir"], f"ref_feats_{split}.pt")
        ex.extract(
            csv_path=ctx["data"][f"{split}_csv"], root="", batch_size=64,
            workers=1, device="cpu", fp16=False, model_name="mini-dress",
            pretrained=ctx["init"], checkpoint=ckpt,
            image_size=MINI_CFG["vision_cfg"]["image_size"],
            path_col="filepath", label_col="label", ignore_labels=False,
            out_path=out_pt,
        )
        outs[split] = out_pt

    knn = load_script("eval_knn").knn_top1(
        outs["train"], outs["val"], k=20, device="cpu"
    )
    geo = load_script("eval_geometry")
    import torch

    feats = torch.load(outs["val"], map_location="cpu")["feats"].float()
    torch.manual_seed(0)  # the reference samples pairs from the global RNG
    uni = float(geo.uniformity(torch.nn.functional.normalize(feats, dim=-1)))
    pc1, pc10, pc100 = geo.anisotropy(feats)
    # the reference's run() prints the best top-1 but returns None — capture
    # its own stdout rather than reimplementing its probe
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        load_script("eval_linear_probe").run(
            outs["train"], outs["val"], epochs=20, lr=0.1, device="cpu"
        )
    m = re.search(r"best top1=([0-9.]+)", buf.getvalue())
    lp = float(m.group(1)) if m else float("nan")
    return {"knn_top1": float(knn), "uniformity": uni,
            "anisotropy_pc1": float(pc1), "linear_probe_top1": lp}


def offline_suite_tpu(ctx, ckpt, tag="jax"):
    """Our §2.4 offline pipeline on `ckpt` (our orbax dir OR a reference
    torch .pt — load_checkpoint converts either)."""
    from refining_clip_via_dinov2_representations_tpu.eval import offline

    outs = {}
    for split in ("train", "val"):
        out_pt = os.path.join(ctx["workdir"], f"{tag}_feats_{split}.pt")
        offline.extract_features(
            ctx["data"][f"{split}_csv"], out_pt, model_name="mini-dress",
            pretrained=ctx["init"], checkpoint=ckpt, batch_size=64,
            precision="fp32",
        )
        outs[split] = out_pt
    knn = offline.knn_top1(outs["train"], outs["val"], k=20)
    geom = offline.eval_geometry(outs["val"])
    lp = offline.linear_probe(outs["train"], outs["val"], epochs=20, lr=0.1)
    return {
        "knn_top1": float(knn),
        "uniformity": float(geom["uniformity"]),
        "anisotropy_pc1": float(geom["pc1"]),
        "linear_probe_top1": float(lp),
    }


# ---------------------------------------------------------------------------
# comparison
# ---------------------------------------------------------------------------

RECALL_KEYS = [
    "text_to_image_R@1", "text_to_image_R@5", "text_to_image_R@10",
    "image_to_text_R@1", "image_to_text_R@5", "image_to_text_R@10",
]
SCALAR_KEYS = ["average_similarity", "modality_gap", "clip_val_loss"]


def compare(ref_itm, jax_itm, ref_blind, jax_blind, ref_off, jax_off, epochs,
            cross_off=None):
    rows, failures = [], []

    def check(section, key, rv, jv, tol):
        delta = abs(float(rv) - float(jv))
        ok = delta <= tol
        rows.append((section, key, float(rv), float(jv), delta, tol, ok))
        if not ok:
            failures.append(f"{section}/{key}: ref={rv} jax={jv} |Δ|={delta:.4f} > {tol}")

    e0_ref, e0_jax = ref_itm.get(0), jax_itm.get(0)
    for key in RECALL_KEYS:
        check("epoch0", key, e0_ref[key], e0_jax[key], EPOCH0_TOL)
    for key in SCALAR_KEYS:
        if key in e0_ref and key in e0_jax:
            check("epoch0", key, e0_ref[key], e0_jax[key], EPOCH0_SCALAR_TOL)

    ef_ref, ef_jax = ref_itm.get(epochs), jax_itm.get(epochs)
    for key in RECALL_KEYS:
        check("final", key, ef_ref[key], ef_jax[key], FINAL_RECALL_TOL)
    rmean_ref = sum(ef_ref[k] for k in RECALL_KEYS) / len(RECALL_KEYS)
    rmean_jax = sum(ef_jax[k] for k in RECALL_KEYS) / len(RECALL_KEYS)
    check("final", "r_mean", rmean_ref, rmean_jax, FINAL_RMEAN_TOL)

    for split in sorted(set(ref_blind) & set(jax_blind)):
        shared = set(ref_blind[split]) & set(jax_blind[split])
        for key in sorted(shared):
            check(f"clip_blind/{split}", key,
                  ref_blind[split][key], jax_blind[split][key], BLIND_TOL)

    check("offline", "knn_top1", ref_off["knn_top1"], jax_off["knn_top1"], KNN_TOL)
    check("offline", "linear_probe_top1",
          ref_off["linear_probe_top1"], jax_off["linear_probe_top1"], KNN_TOL)
    check("offline", "uniformity",
          ref_off["uniformity"], jax_off["uniformity"], GEOM_UNIFORMITY_TOL)
    check("offline", "anisotropy_pc1",
          ref_off["anisotropy_pc1"], jax_off["anisotropy_pc1"], ANISO_TOL)

    if cross_off is not None:
        # same weights, both pipelines: tight bounds (kNN / geometry are
        # deterministic; the probes run different SGD implementations)
        check("offline_cross", "knn_top1",
              ref_off["knn_top1"], cross_off["knn_top1"], 0.02)
        check("offline_cross", "uniformity",
              ref_off["uniformity"], cross_off["uniformity"], 0.01)
        check("offline_cross", "anisotropy_pc1",
              ref_off["anisotropy_pc1"], cross_off["anisotropy_pc1"], 0.01)
        check("offline_cross", "linear_probe_top1",
              ref_off["linear_probe_top1"], cross_off["linear_probe_top1"], 0.10)
    return rows, failures


def write_report(path, rows, failures, meta):
    lines = [
        "# Dress rehearsal — torch reference vs TPU rebuild",
        "",
        f"Config: {json.dumps(meta)}",
        "",
        "| section | metric | reference | rebuild | abs diff | tol | ok |",
        "|---|---|---|---|---|---|---|",
    ]
    for sec, key, rv, jv, d, tol, ok in rows:
        lines.append(
            f"| {sec} | {key} | {rv:.4f} | {jv:.4f} | {d:.4f} | {tol} |"
            f" {'✓' if ok else '✗'} |"
        )
    lines.append("")
    lines.append(
        f"**Result: {'PASS' if not failures else 'FAIL'}** "
        f"({len(rows) - len(failures)}/{len(rows)} within tolerance)"
    )
    for f_ in failures:
        lines.append(f"- FAIL {f_}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def run_all(workdir, epochs=3, n_train=160, n_val=40, seed=0):
    ctx = prepare(workdir, n_train=n_train, n_val=n_val, seed=seed)
    ref_dir = run_reference(ctx, epochs)
    jax_dir = run_tpu(ctx, epochs)
    ref_itm, jax_itm = load_itm_results(ref_dir), load_itm_results(jax_dir)
    ref_blind, jax_blind = load_clip_blind(ref_dir), load_clip_blind(jax_dir)
    ref_off = offline_suite_reference(ctx, ref_dir, epochs)
    jax_off = offline_suite_tpu(
        ctx, os.path.join(jax_dir, "checkpoints", f"epoch_{epochs}")
    )
    # cross-stack pipeline check: OUR extract+metrics on the REFERENCE's
    # final torch checkpoint. Same weights through both offline pipelines —
    # isolates preprocessing/extract/metric parity from training-dynamics
    # variance (which the jax_off comparison necessarily includes).
    cross_off = offline_suite_tpu(
        ctx, os.path.join(ref_dir, "checkpoints", f"epoch_{epochs}.pt"),
        tag="cross",
    )
    rows, failures = compare(
        ref_itm, jax_itm, ref_blind, jax_blind, ref_off, jax_off, epochs,
        cross_off=cross_off,
    )
    meta = {"epochs": epochs, "n_train": n_train, "n_val": n_val, "seed": seed}
    write_report(os.path.join(workdir, "DRESS_REHEARSAL.md"), rows, failures, meta)
    with open(os.path.join(workdir, "dress_rehearsal.json"), "w") as f:
        json.dump(
            {"rows": rows, "failures": failures, "meta": meta,
             "ref_offline": ref_off, "jax_offline": jax_off},
            f, indent=1, default=float,
        )
    return rows, failures


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="/tmp/dress_rehearsal")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--n-train", type=int, default=160)
    p.add_argument("--n-val", type=int, default=40)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)
    os.makedirs(a.workdir, exist_ok=True)
    rows, failures = run_all(
        a.workdir, epochs=a.epochs, n_train=a.n_train, n_val=a.n_val, seed=a.seed
    )
    print(open(os.path.join(a.workdir, "DRESS_REHEARSAL.md")).read())
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
