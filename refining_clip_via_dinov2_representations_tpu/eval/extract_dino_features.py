"""Precompute DINOv2 teacher features + index map for a training CSV.

The reference *consumes* precomputed artifacts (`--dino_fts_path` tensor +
`--dino_index_map_path` path→row map, `main.py:692-741`) but ships no tool
that produces them. This CLI closes the loop: CSV → batched DINOv2 CLS
features (`.npy`, mmap-ready for `DinoFeatureStore`) + canonical-path index
map (`.json`), built with the same `_canon_path` used by `CsvDataset` so the
alignment validation passes by construction.

  python -m refining_clip_via_dinov2_representations_tpu.eval.extract_dino_features \
      --csv train.csv --img-key filepath \
      --dino-model facebook/dinov2-small \
      --out-feats dino_feats.npy --out-map dino_index_map.json
"""

from __future__ import annotations

import argparse
import json
import logging


def main(argv=None):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ..models.dinov2 import (
        IMAGENET_DEFAULT_MEAN,
        IMAGENET_DEFAULT_STD,
        load_dinov2_model,
    )
    from ..train.data import _canon_path
    from ..transform import image_transform

    ap = argparse.ArgumentParser("extract_dino_features")
    ap.add_argument("--csv", required=True)
    ap.add_argument("--img-key", default="filepath")
    ap.add_argument("--dino-model", default="facebook/dinov2-small")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--out-feats", required=True, help=".npy output")
    ap.add_argument("--out-map", required=True, help=".json path->row map")
    ap.add_argument("--cache-dir", default=None)
    args = ap.parse_args(argv)

    import pandas as pd

    df = pd.read_csv(args.csv)
    paths = [_canon_path(p) for p in df[args.img_key].tolist()]
    uniq = list(dict.fromkeys(paths))  # unique, order-preserving
    logging.info("%d rows, %d unique images", len(paths), len(uniq))

    model, variables = load_dinov2_model(args.dino_model, cache_dir=args.cache_dir)
    # teacher-native preprocessing: shortest-edge resize + center crop +
    # ImageNet normalization (HF Dinov2 processor defaults)
    preprocess = image_transform(
        args.image_size, is_train=False,
        mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD,
    )

    @jax.jit
    def encode(images):
        return model.apply(variables, images)

    from ._batching import encode_images_padded

    all_feats = encode_images_padded(
        encode, uniq, preprocess, args.batch_size, log_tag="dino"
    )
    np.save(args.out_feats, all_feats)
    index_map = {p: i for i, p in enumerate(uniq)}
    with open(args.out_map, "w") as f:
        json.dump({"path_to_index": index_map}, f)
    logging.info("wrote %s %s and %s (%d entries)",
                 args.out_feats, all_feats.shape, args.out_map, len(index_map))
    return args.out_feats, args.out_map


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
