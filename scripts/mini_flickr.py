"""Deterministic procedural mini-Flickr dataset for the offline
quality-parity dress rehearsal (VERDICT r4 next-round #2).

Generates N images of colored geometric shapes on colored backgrounds with
5 structured captions each (Flickr30k layout: 5 consecutive CSV rows per
image), plus:

- `dino_feats.pt`     — [n_images, dino_dim] fp32 "teacher" features: a fixed
                        random projection of the latent factors (shape,
                        color, bg, position, size) + small per-image noise,
                        L2-normalized. Same-factor images have high cosine —
                        real DINO-like structure, not noise.
- `dino_index_map.pt` — {canonical image path: row index} (the reference's
                        `--dino_index_map_path` format, data.py:99-112).
- `train.csv` / `val.csv` — columns (filepath, title, label), comma-sep;
                        label = shape class for the kNN / linear-probe evals.

Everything is seeded: same seed + same out_dir layout => byte-identical
captions/features and pixel-identical PNGs.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
from PIL import Image, ImageDraw

SHAPES = ["circle", "square", "triangle", "cross"]
COLORS = {
    "red": (220, 50, 47), "green": (64, 160, 43), "blue": (38, 99, 235),
    "yellow": (228, 200, 32), "purple": (150, 70, 200), "orange": (235, 135, 25),
    "cyan": (42, 180, 190), "white": (238, 238, 238),
}
BGS = {
    "black": (15, 15, 20), "gray": (105, 105, 110),
    "navy": (18, 28, 78), "olive": (68, 82, 28),
}
POSITIONS = {
    "left": (0.30, 0.50), "right": (0.70, 0.50),
    "top": (0.50, 0.30), "bottom": (0.50, 0.70), "center": (0.50, 0.50),
}
SIZES = {"small": 0.18, "large": 0.34}

CAPTION_TEMPLATES = [
    "a {size} {color} {shape} on a {bg} background",
    "the {shape} in this picture is {color}",
    "a photo of a {color} {shape} near the {pos} of the frame",
    "one {size} {shape} colored {color} over a {bg} backdrop",
    "an image showing a {color} {shape} at the {pos}",
]


def _draw(size_px, shape, color, bg, pos, size_frac):
    img = Image.new("RGB", (size_px, size_px), bg)
    d = ImageDraw.Draw(img)
    cx, cy = pos[0] * size_px, pos[1] * size_px
    r = size_frac * size_px
    if shape == "circle":
        d.ellipse([cx - r, cy - r, cx + r, cy + r], fill=color)
    elif shape == "square":
        d.rectangle([cx - r, cy - r, cx + r, cy + r], fill=color)
    elif shape == "triangle":
        d.polygon(
            [(cx, cy - r), (cx - r * math.sin(math.pi / 3), cy + r / 2),
             (cx + r * math.sin(math.pi / 3), cy + r / 2)], fill=color,
        )
    else:  # cross
        w = r * 0.38
        d.rectangle([cx - r, cy - w, cx + r, cy + w], fill=color)
        d.rectangle([cx - w, cy - r, cx + w, cy + r], fill=color)
    return img


def _factor_features(factors, dino_dim, rng_proj, noise, rng_noise):
    """One-hot latent factors -> fixed Gaussian projection -> + noise -> L2."""
    onehot = np.zeros(
        len(SHAPES) + len(COLORS) + len(BGS) + len(POSITIONS) + len(SIZES),
        np.float64,
    )
    offs = 0
    for value, space in zip(
        factors,
        (SHAPES, list(COLORS), list(BGS), list(POSITIONS), list(SIZES)),
    ):
        onehot[offs + space.index(value)] = 1.0
        offs += len(space)
    feat = rng_proj @ onehot
    feat = feat + noise * rng_noise.normal(size=dino_dim)
    return (feat / np.linalg.norm(feat)).astype(np.float32)


def generate(out_dir, n_train=160, n_val=40, size_px=64, dino_dim=64,
             seed=0, noise=0.15):
    """Build the dataset; returns a dict of artifact paths."""
    import torch

    rng = np.random.default_rng(seed)
    rng_proj = np.random.default_rng(seed + 1).normal(
        size=(dino_dim, len(SHAPES) + len(COLORS) + len(BGS) + len(POSITIONS) + len(SIZES))
    )
    rng_noise = np.random.default_rng(seed + 2)

    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)

    rows = {"train": [], "val": []}
    feats, index_map = [], {}
    for i in range(n_train + n_val):
        factors = (
            SHAPES[int(rng.integers(len(SHAPES)))],
            list(COLORS)[int(rng.integers(len(COLORS)))],
            list(BGS)[int(rng.integers(len(BGS)))],
            list(POSITIONS)[int(rng.integers(len(POSITIONS)))],
            list(SIZES)[int(rng.integers(len(SIZES)))],
        )
        shape, color, bg, pos, sz = factors
        path = os.path.realpath(os.path.join(img_dir, f"img_{i:04d}.png"))
        _draw(size_px, shape, COLORS[color], BGS[bg], POSITIONS[pos], SIZES[sz]).save(path)
        caps = [
            t.format(shape=shape, color=color, bg=bg, pos=pos, size=sz)
            for t in CAPTION_TEMPLATES
        ]
        split = "train" if i < n_train else "val"
        for c in caps:
            rows[split].append((path, c, SHAPES.index(shape)))
        index_map[path] = len(feats)
        feats.append(_factor_features(factors, dino_dim, rng_proj, noise, rng_noise))

    for split in ("train", "val"):
        with open(os.path.join(out_dir, f"{split}.csv"), "w") as f:
            f.write("filepath,title,label\n")
            for path, cap, label in rows[split]:
                f.write(f"{path},{cap},{label}\n")

    feats_t = torch.tensor(np.stack(feats), dtype=torch.float32)
    torch.save(feats_t, os.path.join(out_dir, "dino_feats.pt"))
    torch.save(index_map, os.path.join(out_dir, "dino_index_map.pt"))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"n_train": n_train, "n_val": n_val, "size_px": size_px,
                   "dino_dim": dino_dim, "seed": seed}, f)
    return {
        "train_csv": os.path.join(out_dir, "train.csv"),
        "val_csv": os.path.join(out_dir, "val.csv"),
        "dino_feats": os.path.join(out_dir, "dino_feats.pt"),
        "dino_index_map": os.path.join(out_dir, "dino_index_map.pt"),
        "img_dir": img_dir,
    }


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mini_flickr"
    paths = generate(out)
    print(json.dumps(paths, indent=1))
