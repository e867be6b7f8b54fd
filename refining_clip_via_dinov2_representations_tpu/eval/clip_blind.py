"""CLIP-blind pair analysis — the thesis' diagnostic metric.

Rebuild of the fork's machinery (`src/open_clip_train/helpers.py:114-389` and
the standalone `test_scripts/clip_blinds.py`): a pair of images is
"CLIP-blind" when their CLIP embeddings are very similar but their DINOv2
embeddings are not — i.e. CLIP can't tell them apart while a
structure-sensitive teacher can. The headline number (BASELINE.md) is the
*relative* percentage: blind pairs / CLIP-high pairs.

Pipeline: encode images (jitted) → dedup by canonical path → align cached
DINO features by path (basename fallback) → upper-triangle similarity
thresholding → summary + top-gap pairs.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..train.data import _canon_path

DEFAULT_THRESHOLDS: List[Tuple[float, float]] = [(0.90, 0.60), (0.85, 0.65), (0.80, 0.65)]


def encode_clip_images_and_paths(model, variables, dataloader, max_images=None):
    """[M, D] L2-normalized CLIP image features + canonical paths
    (`helpers.py:114-146`). Stops encoding once `max_images` samples are
    collected — the train-split check caps at a few thousand images and must
    not push the whole training set through the tower first."""

    @jax.jit
    def encode(images):
        feats = model.apply(variables, images, method="encode_image")
        return feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
        )

    embs, paths_all = [], []
    total = 0
    for batch in dataloader:
        if "image_path" not in batch:
            raise RuntimeError(
                "Eval batch missing file paths; CsvDataset should return them."
            )
        embs.append(np.asarray(encode(jnp.asarray(batch["images"])), np.float32))
        paths_all.extend(_canon_path(p) for p in batch["image_path"])
        total += len(batch["image_path"])
        if max_images and total >= max_images:
            break
    clip_z = np.concatenate(embs, axis=0) if embs else np.empty((0, 0))
    return clip_z, paths_all


def encode_clip_and_dino_images(model, variables, dino_teacher, dataloader,
                                max_images=None):
    """Live-teacher variant: one pass over the loader produces BOTH the CLIP
    and the (L2-normalized) DINOv2 embeddings of the same pixels — no path
    alignment needed. Used when training ran with a live teacher
    (no --dino_fts_path), where no precomputed feature store exists."""

    @jax.jit
    def encode(tvars, images):
        feats = model.apply(variables, images, method="encode_image")
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
        )
        # teacher weights as a traced argument — closure capture would bake
        # them into the program as HLO literal constants (train/step.py)
        dino = dino_teacher.extract(images, variables=tvars).astype(jnp.float32)
        dino = dino / jnp.maximum(jnp.linalg.norm(dino, axis=-1, keepdims=True), 1e-12)
        return feats, dino

    clip_all, dino_all, paths_all = [], [], []
    total = 0
    for batch in dataloader:
        if "image_path" not in batch:
            raise RuntimeError(
                "Eval batch missing file paths; CsvDataset should return them."
            )
        c, d = encode(dino_teacher.variables, jnp.asarray(batch["images"]))
        clip_all.append(np.asarray(c, np.float32))
        dino_all.append(np.asarray(d, np.float32))
        paths_all.extend(_canon_path(p) for p in batch["image_path"])
        total += len(batch["image_path"])
        if max_images and total >= max_images:
            break
    if not clip_all:
        return np.empty((0, 0)), np.empty((0, 0)), paths_all
    return np.concatenate(clip_all), np.concatenate(dino_all), paths_all


def build_dino_path_maps(dino_index_map_obj: Dict):
    """path→idx + basename→idx maps (`helpers.py:148-173`)."""
    if not isinstance(dino_index_map_obj, dict):
        raise RuntimeError("DINO index map must be a dict.")
    if "path_to_index" in dino_index_map_obj:
        p2i_raw = dino_index_map_obj["path_to_index"]
    else:
        p2i_raw = {
            k: v for k, v in dino_index_map_obj.items() if isinstance(v, (int, np.integer))
        }
    path2idx = {_canon_path(k): int(v) for k, v in p2i_raw.items()}
    if isinstance(dino_index_map_obj.get("basename_to_index"), dict):
        base2idx = {
            os.path.basename(k): int(v)
            for k, v in dino_index_map_obj["basename_to_index"].items()
        }
    else:
        base2idx = {os.path.basename(k): int(v) for k, v in path2idx.items()}
    return path2idx, base2idx


def dedup_by_path(clip_z: np.ndarray, paths: List[str]):
    """First-occurrence dedup (`helpers.py:176-191`)."""
    seen = {}
    idx_keep = []
    for i, p in enumerate(paths):
        if p not in seen:
            seen[p] = i
            idx_keep.append(i)
    if len(idx_keep) == len(paths):
        return clip_z, paths, list(range(len(paths)))
    return clip_z[idx_keep], [paths[i] for i in idx_keep], idx_keep


def align_dino_feats_to_paths(
    dino_feats: np.ndarray, path2idx: Dict, base2idx: Dict, paths: List[str]
):
    """Path-first, basename-fallback alignment (`helpers.py:193-219`)."""
    out, keep_idx = [], []
    hit_path = hit_base = miss = 0
    for i, p in enumerate(paths):
        j = path2idx.get(p)
        via_base = False
        if j is None:
            j = base2idx.get(os.path.basename(p))
            via_base = j is not None
        if j is None or not (0 <= int(j) < len(dino_feats)):
            # unknown path, or a stale/foreign index map pointing past the
            # feature store: count as a miss instead of crashing
            miss += 1
            continue
        if via_base:
            hit_base += 1
        else:
            hit_path += 1
        out.append(np.asarray(dino_feats[j], np.float32))
        keep_idx.append(i)
    if not out:
        return None, [], hit_path, hit_base, miss
    z = np.stack(out, axis=0)
    z = z / np.maximum(np.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
    return z, keep_idx, hit_path, hit_base, miss


def pair_stats(
    clip_z: np.ndarray,
    dino_z: np.ndarray,
    thresholds: Sequence[Tuple[float, float]] = DEFAULT_THRESHOLDS,
    top_k: int = 200,
) -> Dict:
    """Upper-triangle blind-pair statistics (`helpers.py:221-285`).

    relative_percent = blind / CLIP-high pairs — the reported metric."""
    cs = clip_z @ clip_z.T
    ds = dino_z @ dino_z.T
    iu, ju = np.triu_indices(cs.shape[0], k=1)
    cs_u = cs[iu, ju]
    ds_u = ds[iu, ju]
    gap = cs_u - ds_u

    total_pairs = int(cs_u.size)
    out = {"total_pairs": total_pairs, "results": {}, "thresholds": list(thresholds)}
    for cmin, dmax in thresholds:
        clip_high = cs_u >= cmin
        blind = clip_high & (ds_u <= dmax)
        chc = int(clip_high.sum())
        bc = int(blind.sum())
        out["results"][f"clip≥{cmin}_dino≤{dmax}"] = {
            "count": bc,
            "percent": 100.0 * bc / (total_pairs or 1),
            "clip_high_count": chc,
            "relative_percent": 100.0 * bc / (chc or 1),
        }

    k = min(top_k, total_pairs)
    if k > 0:
        # top-k selection in linear time (full argsort over the ~n²/2 pair
        # gaps was the hot spot for large standalone runs)
        part = np.argpartition(-gap, k - 1)[:k]
        top = part[np.argsort(-gap[part])]
        out["top_pairs"] = [
            {
                "i": int(iu[r]),
                "j": int(ju[r]),
                "clip_sim": float(cs_u[r]),
                "dino_sim": float(ds_u[r]),
                "gap": float(gap[r]),
            }
            for r in top
        ]
    else:
        out["top_pairs"] = []
    return out


def run_clip_blind_on_split(
    split_key: str,
    data: Dict,
    model,
    variables,
    dino_feats: Optional[np.ndarray],
    dino_index_map_obj: Optional[Dict],
    out_dir: str,
    thresholds: Sequence[Tuple[float, float]] = DEFAULT_THRESHOLDS,
    max_images: Optional[int] = 2000,
    dino_teacher=None,
) -> Optional[Dict]:
    """Full split runner + JSON/CSV artifacts (`helpers.py:287-389`).

    Teacher features come from either the precomputed store
    (`dino_feats` + `dino_index_map_obj`, path-aligned like the reference)
    or a live `dino_teacher` (frozen flax DINOv2 encoding the same batch —
    used when training ran without --dino_fts_path)."""
    if split_key not in data:
        logging.info("[clip-blind] split %s not in data; skipping", split_key)
        return None
    if dino_teacher is not None:
        clip_z, dino_z, paths = encode_clip_and_dino_images(
            model, variables, dino_teacher, data[split_key].dataloader,
            max_images=(2 * max_images) if max_images else None,
        )
        clip_z, paths, keep = dedup_by_path(clip_z, paths)
        dino_z = dino_z[keep]
        if max_images and clip_z.shape[0] > max_images:
            clip_z, dino_z, paths = (
                clip_z[:max_images], dino_z[:max_images], paths[:max_images]
            )
        logging.info(
            "[clip-blind] %s: %d images (live teacher)", split_key, clip_z.shape[0]
        )
    else:
        clip_z, paths = encode_clip_images_and_paths(
            model, variables, data[split_key].dataloader,
            # encode a small margin past the cap so post-dedup we still have it
            max_images=(2 * max_images) if max_images else None,
        )
        clip_z, paths, _ = dedup_by_path(clip_z, paths)
        if max_images and clip_z.shape[0] > max_images:
            clip_z, paths = clip_z[:max_images], paths[:max_images]

        path2idx, base2idx = build_dino_path_maps(dino_index_map_obj)
        dino_z, keep_idx, hit_path, hit_base, miss = align_dino_feats_to_paths(
            dino_feats, path2idx, base2idx, paths
        )
        if dino_z is None:
            logging.warning("[clip-blind] no DINO alignment on %s (miss=%d)", split_key, miss)
            return None
        clip_z = clip_z[keep_idx]
        # pair indices below refer to the ALIGNED arrays — remap paths too, or
        # the top-pairs CSV names the wrong images whenever miss > 0
        paths = [paths[i] for i in keep_idx]
        logging.info(
            "[clip-blind] %s: %d images (path hits %d, basename hits %d, miss %d)",
            split_key, clip_z.shape[0], hit_path, hit_base, miss,
        )

    stats = pair_stats(clip_z, dino_z, thresholds)
    os.makedirs(out_dir, exist_ok=True)
    summary_path = os.path.join(out_dir, f"clip_blind_{split_key}.json")
    with open(summary_path, "w") as f:
        json.dump(stats, f, indent=2, ensure_ascii=False, default=float)

    pairs_csv = os.path.join(out_dir, f"clip_blind_{split_key}_top_pairs.csv")
    with open(pairs_csv, "w") as f:
        f.write("i,j,path_i,path_j,clip_sim,dino_sim,gap\n")
        for p in stats["top_pairs"]:
            f.write(
                f"{p['i']},{p['j']},{paths[p['i']]},{paths[p['j']]},"
                f"{p['clip_sim']:.4f},{p['dino_sim']:.4f},{p['gap']:.4f}\n"
            )
    logging.info("[clip-blind] wrote %s", summary_path)
    return stats
