"""Offline-eval orchestrator: extract → kNN → geometry → linear probe.

Rebuild of `test_scripts/run_all_evals.py` (which ships syntax-broken at
:138/:160 — SURVEY §2.4); this version runs the stages in-process instead of
via subprocesses, with the same stage order and outputs.
"""

from __future__ import annotations

import argparse
import json
import logging
import os


def main(argv=None):
    from .offline import eval_geometry, extract_features, knn_top1, linear_probe

    ap = argparse.ArgumentParser("run_all_evals")
    ap.add_argument("--train-csv", required=True, help="CSV with (filepath,label)")
    ap.add_argument("--val-csv", required=True)
    ap.add_argument("--img-key", default="filepath")
    ap.add_argument("--label-key", default="label")
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--pretrained", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out-dir", default="./eval_out")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--knn-k", type=int, default=20)
    ap.add_argument("--probe-epochs", type=int, default=15)
    ap.add_argument("--skip-extract", action="store_true")
    args = ap.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    train_feats = os.path.join(args.out_dir, "train_feats.npz")
    val_feats = os.path.join(args.out_dir, "val_feats.npz")

    if not args.skip_extract:
        logging.info("[1/4] extracting train features")
        extract_features(
            args.train_csv, train_feats, args.model, args.pretrained,
            args.checkpoint, args.img_key, args.label_key, args.batch_size,
        )
        logging.info("[1/4] extracting val features")
        extract_features(
            args.val_csv, val_feats, args.model, args.pretrained,
            args.checkpoint, args.img_key, args.label_key, args.batch_size,
        )

    logging.info("[2/4] kNN")
    knn = knn_top1(train_feats, val_feats, k=args.knn_k)

    logging.info("[3/4] geometry")
    geom = eval_geometry(val_feats)

    logging.info("[4/4] linear probe")
    probe = linear_probe(train_feats, val_feats, epochs=args.probe_epochs)

    results = {"knn_top1": knn, "linear_probe_top1": probe, **geom}
    out = os.path.join(args.out_dir, "all_evals.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
