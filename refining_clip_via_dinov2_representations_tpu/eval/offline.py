"""Offline evaluation harness — the `test_scripts/` suite, JAX edition.

One module housing the five thesis acceptance tools (reference
`test_scripts/*.py`, SURVEY §2.4) as callable functions + CLIs:

  extract_features   CSV(path,label) → normalized CLIP image features
  knn_top1           blocked cosine kNN (k=20) on frozen features
  uniformity/anisotropy   embedding-geometry diagnostics
  linear_probe       SGD linear head on frozen features (best top-1)
  clip_blind_standalone   blind-pair counting vs cached DINO features

Feature files are `.npz` with keys {feats, labels[, classes]}; the loaders
also accept the reference's torch `.pt` layout for interop.

`run_all_evals` (reference `run_all_evals.py`, which ships with syntax
errors at :138/:160) is rebuilt as an in-process pipeline in
`run_all_evals.py`.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def load_feats(path: str):
    """Load {feats, labels[, classes]} from .npz or reference .pt."""
    if str(path).endswith(".pt"):
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        feats = obj["feats"].float().numpy()
        labels = obj["labels"].long().numpy()
        classes = obj.get("classes")
    else:
        z = np.load(path, allow_pickle=True)
        feats = np.asarray(z["feats"], np.float32)
        labels = np.asarray(z["labels"], np.int64)
        classes = z["classes"].tolist() if "classes" in z else None
    return feats, labels, classes


def save_feats(path: str, feats: np.ndarray, labels: np.ndarray, classes=None):
    """Write a feature dump `load_feats` can read back at the SAME path.

    A `.pt` path gets the reference's torch layout
    (`extract_features_from_csv.py:63-89`: {feats, labels[, classes]}) —
    interop both ways. Anything else goes through np.savez, which appends
    `.npz` itself when missing (passing a `.pt` name to np.savez used to
    strand the dump at `<name>.pt.npz` where load_feats can't find it)."""
    if str(path).endswith(".pt"):
        import torch

        payload = {
            "feats": torch.from_numpy(np.ascontiguousarray(feats, np.float32)),
            "labels": torch.from_numpy(np.ascontiguousarray(labels, np.int64)),
        }
        if classes is not None:
            payload["classes"] = list(classes)
        torch.save(payload, path)
        return
    payload = {"feats": feats.astype(np.float32), "labels": labels.astype(np.int64)}
    if classes is not None:
        payload["classes"] = np.asarray(classes)
    np.savez(path, **payload)


def _l2n(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def align_label_spaces(ytr, ctr, yva, cva):
    """Remap two feature files' integer labels onto one shared class space.

    `extract_features` (like the reference's `extract_features_from_csv.py:50`)
    builds its class→index map per CSV, so a val split missing some train
    class shifts every subsequent id — train-space predictions would then be
    compared against val-space labels and accuracy silently deflates. When
    both files stored their `classes` lists, remap through the sorted union;
    files without class lists are assumed pre-aligned (reference behavior)."""
    if not ctr or not cva:
        return ytr, yva, None
    ctr = [str(c) for c in ctr]
    cva = [str(c) for c in cva]
    if ctr == cva:
        return ytr, yva, ctr
    union = sorted(set(ctr) | set(cva))
    m = {c: i for i, c in enumerate(union)}
    ytr = np.asarray([m[ctr[int(y)]] for y in ytr], np.int64)
    yva = np.asarray([m[cva[int(y)]] for y in yva], np.int64)
    return ytr, yva, union


# ---------------------------------------------------------------------------
# extract_features (`test_scripts/extract_features_from_csv.py`)
# ---------------------------------------------------------------------------

def extract_features(
    csv_path: str,
    out_path: str,
    model_name: str = "ViT-B-32",
    pretrained: Optional[str] = None,
    checkpoint: Optional[str] = None,
    img_key: str = "filepath",
    label_key: str = "label",
    batch_size: int = 256,
    precision: str = "bf16",
):
    """Dump normalized `encode_image` features for a (path, label) CSV."""
    import jax
    import pandas as pd

    from ..models import create_model_and_transforms, load_checkpoint

    # the reference's build_image_encoder ALWAYS forces QuickGELU
    # (`extract_features_from_csv.py:13`) — without it, OpenAI-pretrained
    # towers silently run plain GELU against QuickGELU weights
    model, variables, _, preprocess = create_model_and_transforms(
        model_name, pretrained, precision=precision, force_quick_gelu=True
    )
    if checkpoint:
        variables, _ = load_checkpoint(model, variables, checkpoint, strict=False)

    df = pd.read_csv(csv_path)
    paths = df[img_key].tolist()
    raw_labels = df[label_key].tolist()
    classes = sorted(set(map(str, raw_labels)))
    cls2idx = {c: i for i, c in enumerate(classes)}
    labels = np.asarray([cls2idx[str(l)] for l in raw_labels], np.int64)

    @jax.jit
    def encode(images):
        feats = model.apply(variables, images, method="encode_image", normalize=True)
        return feats

    from ._batching import encode_images_padded

    all_feats = encode_images_padded(
        encode, paths, preprocess, batch_size, log_tag="extract"
    )
    save_feats(out_path, all_feats, labels, classes)
    return out_path


# ---------------------------------------------------------------------------
# kNN (`test_scripts/eval_knn.py:9-26`)
# ---------------------------------------------------------------------------

def knn_top1(train_path: str, val_path: str, k: int = 20, block: int = 8192) -> float:
    xtr, ytr, ctr = load_feats(train_path)
    xva, yva, cva = load_feats(val_path)
    ytr, yva, _ = align_label_spaces(ytr, ctr, yva, cva)
    xtr, xva = _l2n(xtr), _l2n(xva)

    correct = total = 0
    for i in range(0, xva.shape[0], block):
        q = xva[i : i + block]
        s = q @ xtr.T
        topk = np.argpartition(-s, kth=min(k, s.shape[1] - 1), axis=1)[:, :k]
        # order within top-k doesn't matter for the mode
        votes = ytr[topk]
        preds = np.array(
            [np.bincount(row).argmax() for row in votes], np.int64
        )
        correct += int((preds == yva[i : i + block]).sum())
        total += preds.size
    acc = correct / total
    print(f"[kNN] k={k} top1={acc:.4f}")
    return acc


# ---------------------------------------------------------------------------
# geometry (`test_scripts/eval_geometry.py`)
# ---------------------------------------------------------------------------

def uniformity(
    feats: np.ndarray, n_pairs: int = 20000, temperature: float = 2.0, seed: int = 0
) -> float:
    """E[exp(-t ||z_i - z_j||²)] over random pairs (lower = more uniform)."""
    rng = np.random.default_rng(seed)
    n = feats.shape[0]
    i = rng.integers(0, n, n_pairs)
    j = rng.integers(0, n, n_pairs)
    d2 = np.sum((feats[i] - feats[j]) ** 2, axis=1)
    return float(np.exp(-temperature * d2).mean())


def anisotropy(feats: np.ndarray, q: int = 256) -> Tuple[float, float, float]:
    """Explained-variance concentration of the leading PCs."""
    x = feats - feats.mean(axis=0, keepdims=True)
    q = min(q, min(x.shape) - 1)
    s = np.linalg.svd(x, compute_uv=False)[:q]
    expl = s**2 / np.sum(s**2)
    pc1 = float(expl[0])
    pc10 = float(expl[:10].sum()) if expl.size >= 10 else float(expl.sum())
    pc100 = float(expl[:100].sum()) if expl.size >= 100 else float(expl.sum())
    return pc1, pc10, pc100


def eval_geometry(feats_path: str, n_pairs: int = 20000, temperature: float = 2.0):
    feats, _, _ = load_feats(feats_path)
    feats = _l2n(feats)
    u = uniformity(feats, n_pairs, temperature)
    pc1, pc10, pc100 = anisotropy(feats)
    print(f"[uniformity] {u:.6f} (lower better)")
    print(
        f"[anisotropy] PC1={pc1*100:.2f}%  PC1-10={pc10*100:.2f}%  "
        f"PC1-100={pc100*100:.2f}% (flatter better)"
    )
    return {"uniformity": u, "pc1": pc1, "pc10": pc10, "pc100": pc100}


# ---------------------------------------------------------------------------
# linear probe (`test_scripts/eval_linear_probe.py:15-52`)
# ---------------------------------------------------------------------------

def linear_probe(
    train_path: str,
    val_path: str,
    epochs: int = 15,
    lr: float = 1e-2,
    wd: float = 0.0,
    batch_size: int = 2048,
    seed: int = 0,
) -> float:
    """SGD(momentum 0.9) linear head on frozen features; returns best top-1."""
    import jax
    import jax.numpy as jnp
    import optax

    xtr, ytr, ctr = load_feats(train_path)
    xva, yva, cva = load_feats(val_path)
    ytr, yva, union = align_label_spaces(ytr, ctr, yva, cva)
    n_classes = len(union) if union else int(max(ytr.max(), yva.max())) + 1
    in_dim = xtr.shape[1]
    print(f"[data] train={xtr.shape} val={xva.shape} classes={n_classes}")

    params = {
        "w": jnp.zeros((in_dim, n_classes), jnp.float32),
        "b": jnp.zeros((n_classes,), jnp.float32),
    }
    tx = optax.chain(
        optax.add_decayed_weights(wd) if wd else optax.identity(),
        optax.sgd(lr, momentum=0.9),
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = xb @ p["w"] + p["b"]
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, yb[:, None], axis=1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, xb):
        return jnp.argmax(xb @ params["w"] + params["b"], axis=1)

    rng = np.random.default_rng(seed)
    best_acc, best_epoch = 0.0, -1
    n = xtr.shape[0]
    for ep in range(1, epochs + 1):
        order = rng.permutation(n)
        for i in range(0, n, batch_size):
            idx = order[i : i + batch_size]
            params, opt_state, _ = step(
                params, opt_state, jnp.asarray(xtr[idx]), jnp.asarray(ytr[idx])
            )
        preds = []
        for i in range(0, xva.shape[0], batch_size):
            preds.append(np.asarray(predict(params, jnp.asarray(xva[i : i + batch_size]))))
        acc = float((np.concatenate(preds) == yva).mean())
        if acc > best_acc:
            best_acc, best_epoch = acc, ep
        print(f"[eval] acc@top1={acc:.4f} (best {best_acc:.4f} @epoch {best_epoch})")
    print(f"[done] Linear probe best top1={best_acc:.4f} @epoch {best_epoch}")
    return best_acc


# ---------------------------------------------------------------------------
# standalone CLI — the reference ships each tool as its own script
# (test_scripts/extract_features_from_csv.py, eval_knn.py, eval_geometry.py,
# eval_linear_probe.py); here they are subcommands of one module:
#   python -m <pkg>.eval.offline extract --csv ... --out feats.npz
#   python -m <pkg>.eval.offline knn --train tr.npz --val va.npz
#   python -m <pkg>.eval.offline geometry --feats va.npz
#   python -m <pkg>.eval.offline linear-probe --train tr.npz --val va.npz
# ---------------------------------------------------------------------------

def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        prog="offline-evals",
        description="Offline thesis acceptance tools (reference test_scripts/)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="CSV(path,label) -> CLIP image features")
    ex.add_argument("--csv", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--model", default="ViT-B-32")
    ex.add_argument("--pretrained", default=None)
    ex.add_argument("--checkpoint", default=None)
    ex.add_argument("--img-key", default="filepath")
    ex.add_argument("--label-key", default="label")
    ex.add_argument("--batch-size", type=int, default=256)
    ex.add_argument("--precision", default="bf16")

    kn = sub.add_parser("knn", help="blocked cosine kNN top-1 (k=20)")
    kn.add_argument("--train", required=True)
    kn.add_argument("--val", required=True)
    kn.add_argument("--k", type=int, default=20)
    kn.add_argument("--block", type=int, default=8192)

    ge = sub.add_parser("geometry", help="uniformity + anisotropy diagnostics")
    ge.add_argument("--feats", required=True)
    ge.add_argument("--n-pairs", type=int, default=20000)
    ge.add_argument("--temperature", type=float, default=2.0)

    lp = sub.add_parser("linear-probe", help="SGD linear head on frozen feats")
    lp.add_argument("--train", required=True)
    lp.add_argument("--val", required=True)
    lp.add_argument("--epochs", type=int, default=15)
    lp.add_argument("--lr", type=float, default=1e-2)
    lp.add_argument("--wd", type=float, default=0.0)
    lp.add_argument("--batch-size", type=int, default=2048)
    lp.add_argument("--seed", type=int, default=0)

    a = p.parse_args(argv)
    if a.cmd == "extract":
        out = extract_features(
            a.csv, a.out, model_name=a.model, pretrained=a.pretrained,
            checkpoint=a.checkpoint, img_key=a.img_key, label_key=a.label_key,
            batch_size=a.batch_size, precision=a.precision,
        )
        print(f"[done] wrote {out}")
    elif a.cmd == "knn":
        acc = knn_top1(a.train, a.val, k=a.k, block=a.block)
        print(f"[done] kNN top1={acc:.4f}")
    elif a.cmd == "geometry":
        eval_geometry(a.feats, n_pairs=a.n_pairs, temperature=a.temperature)
    elif a.cmd == "linear-probe":
        linear_probe(
            a.train, a.val, epochs=a.epochs, lr=a.lr, wd=a.wd,
            batch_size=a.batch_size, seed=a.seed,
        )


if __name__ == "__main__":
    main()
