"""Fork-specific metrics + end-of-run plots (`src/open_clip/my_metrics.py`).

* `flickr_retrieval_eval_` — standalone 5-captions-per-image retrieval
  (`my_metrics.py:456-504`): ranks computed against first-occurrence image
  rows (0, 5, 10, …), vectorized here instead of per-row python loops.
* `extract_and_plot_itm_scores` — read `final_itm_results.json`, derive
  recall means, emit recall/similarity/modality-gap PNGs + `itm_scores.csv`
  (`my_metrics.py:40-206`).
* `compute_consistency_score` — mean positive-pair cosine
  (`my_metrics.py:208-245`).
* `get_all_embeddings` — batch-encode caption/image lists. DESIGN FIX: the
  reference version is broken (dead code inside its `batch()` generator
  raises NameError on exhaustion — SURVEY §2.1); this one works.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _canon_key(k: str) -> str:
    """(`my_metrics.py:24-37`). NOTE (faithful quirk): the reference maps
    text_to_image_R@* → txt_r* (`my_metrics.py:30`), i.e. the plotted
    "Text R@1" curve is the text→image recall — the OPPOSITE of the
    literature's "text retrieval" naming that `flickr_retrieval_eval_`
    uses for its own txt_r*. Kept byte-identical so plots/CSVs match the
    reference's artifacts; absent keys likewise fill 0.0 downstream like
    the reference (`my_metrics.py:103-106`)."""
    if "/" in k:
        k = k.split("/", 1)[1]
    k = k.replace("text_to_image_R@", "txt_r")
    k = k.replace("image_to_text_R@", "img_r")
    k = k.replace("text_to_image_mean_rank", "txt_mean_rank")
    k = k.replace("text_to_image_median_rank", "txt_median_rank")
    k = k.replace("image_to_text_mean_rank", "img_mean_rank")
    k = k.replace("image_to_text_median_rank", "img_median_rank")
    return k.replace("@", "_at_")


def _l2n(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def flickr_retrieval_eval_(text_embeddings, image_embeddings) -> Dict[str, float]:
    """5-captions-per-image retrieval on aligned caption-level arrays.

    Row layout matches the reference: row i is caption i whose image feature
    (repeated per caption) sits at the same row; images are identified by
    rows 0, 5, 10, … Naming quirk preserved: `txt_r*` are the image→text
    recalls and `img_r*` the text→image recalls, as in the reference.
    """
    t = _l2n(np.asarray(text_embeddings, np.float32))
    i_feats = _l2n(np.asarray(image_embeddings, np.float32))
    n = t.shape[0]
    assert n % 5 == 0
    n_img = n // 5

    average_similarity = float(np.sum(i_feats * t, axis=-1).mean())

    # --- Image → Text: best rank among the image's 5 captions ---
    img_rows = np.arange(0, n, 5)
    scores_it = i_feats[img_rows] @ t.T  # [n_img, N]
    order_it = np.argsort(-scores_it, axis=1)
    rank_of = np.empty_like(order_it)
    rank_of[np.arange(n_img)[:, None], order_it] = np.arange(n)[None, :]
    ranks_img = np.array(
        [rank_of[g, g * 5 : g * 5 + 5].min() for g in range(n_img)], np.int64
    )

    # --- Text → Image: rank of caption's image among first-occurrence rows ---
    scores_ti = t @ i_feats[img_rows].T  # [N, n_img]
    order_ti = np.argsort(-scores_ti, axis=1)
    targets = np.arange(n) // 5
    ranks_cap = np.argmax(order_ti == targets[:, None], axis=1)

    def r(at, ranks):
        return float(100.0 * (ranks < at).mean())

    return {
        "txt_r1": r(1, ranks_img), "txt_r5": r(5, ranks_img), "txt_r10": r(10, ranks_img),
        "img_r1": r(1, ranks_cap), "img_r5": r(5, ranks_cap), "img_r10": r(10, ranks_cap),
        "average_similarity": average_similarity,
    }


def extract_and_plot_itm_scores(
    results_file_path: str,
    output_plot_path: str,
    output_similarity_plot_path: str,
    save_csv_path: Optional[str] = None,
    prefer_dataset: Optional[str] = None,
    output_modality_gap_plot_path: Optional[str] = None,
) -> Dict[str, Tuple]:
    """Per-epoch recall/similarity/modality-gap curves from the run's
    `final_itm_results.json` (`my_metrics.py:40-206`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def _mean_of(keys, d):
        vals = [d[k] for k in keys if k in d]
        return sum(vals) / len(vals) if vals else 0.0

    with open(results_file_path) as f:
        results = json.load(f)

    cols = {
        k: []
        for k in (
            "epoch", "txt_r1", "txt_r5", "txt_r10", "txt_r_mean",
            "img_r1", "img_r5", "img_r10", "img_r_mean", "r_mean",
            "average_similarity", "modality_gap",
        )
    }
    for entry in results:
        epoch = entry.get("epoch")
        res_list = entry.get("results", [])
        if epoch is None or not res_list:
            continue
        chosen = None
        if prefer_dataset is not None:
            chosen = next(
                (r for r in res_list if r.get("val_name") == prefer_dataset), None
            )
        if chosen is None:
            chosen = res_list[0]
        metrics_raw = chosen.get("metrics", chosen)
        m = {
            _canon_key(k): float(v)
            for k, v in metrics_raw.items()
            if isinstance(v, (int, float))
        }
        m.setdefault("txt_r_mean", _mean_of(["txt_r1", "txt_r5", "txt_r10"], m))
        m.setdefault("img_r_mean", _mean_of(["img_r1", "img_r5", "img_r10"], m))
        m.setdefault("r_mean", (m["txt_r_mean"] + m["img_r_mean"]) / 2.0)

        cols["epoch"].append(epoch)
        for k in cols:
            if k != "epoch":
                cols[k].append(m.get(k, 0.0))

    epochs = cols["epoch"]
    if not epochs:
        raise ValueError(f"No usable results found in {results_file_path}")

    r_mean = cols["r_mean"]
    best_r_mean = max(r_mean)
    best_r_mean_epoch = epochs[r_mean.index(best_r_mean)]
    final_epoch, final_r_mean = epochs[-1], r_mean[-1]

    plt.figure()
    for key, label in (
        ("txt_r1", "Text R@1"), ("txt_r5", "Text R@5"), ("txt_r10", "Text R@10"),
        ("img_r1", "Image R@1"), ("img_r5", "Image R@5"), ("img_r10", "Image R@10"),
    ):
        plt.plot(epochs, cols[key], label=label)
    plt.plot(epochs, r_mean, label="R Mean", linestyle="--", linewidth=2)
    plt.scatter([best_r_mean_epoch], [best_r_mean], label=f"Best R Mean ({best_r_mean:.2f})")
    plt.scatter([final_epoch], [final_r_mean], label=f"Final R Mean ({final_r_mean:.2f})")
    plt.xlabel("Epoch"); plt.ylabel("Recall (%)")
    plt.title("ITM Recall Scores over Epochs")
    plt.legend(); plt.grid(True)
    plt.savefig(output_plot_path); plt.close()

    sims = cols["average_similarity"]
    best_sim = max(sims)
    best_sim_epoch = epochs[sims.index(best_sim)]
    plt.figure()
    plt.plot(epochs, sims, label="Average Similarity", linestyle=":", linewidth=2)
    plt.scatter([best_sim_epoch], [best_sim], label=f"Best Sim ({best_sim:.4f})")
    plt.scatter([final_epoch], [sims[-1]], label=f"Final Sim ({sims[-1]:.4f})")
    plt.xlabel("Epoch"); plt.ylabel("Similarity")
    plt.title("Average Similarity over Epochs")
    plt.legend(); plt.grid(True)
    plt.savefig(output_similarity_plot_path); plt.close()

    if output_modality_gap_plot_path is None and output_similarity_plot_path:
        output_modality_gap_plot_path = os.path.join(
            os.path.dirname(output_similarity_plot_path), "modality_gap_plot.png"
        )
    gaps = cols["modality_gap"]
    best_gap = min(gaps)
    best_gap_epoch = epochs[gaps.index(best_gap)]
    plt.figure()
    plt.plot(epochs, gaps, label="Modality Gap (L2)", linewidth=2)
    plt.scatter([best_gap_epoch], [best_gap], label=f"Best (min) Gap ({best_gap:.4f})")
    plt.scatter([final_epoch], [gaps[-1]], label=f"Final Gap ({gaps[-1]:.4f})")
    plt.xlabel("Epoch"); plt.ylabel("L2 Distance")
    plt.title("Modality Gap over Epochs")
    plt.legend(); plt.grid(True)
    plt.savefig(output_modality_gap_plot_path); plt.close()

    if save_csv_path:
        import pandas as pd

        pd.DataFrame(cols).to_csv(save_csv_path, index=False)

    return {
        "best_r_mean": (best_r_mean_epoch, best_r_mean),
        "final_r_mean": (final_epoch, final_r_mean),
        "best_similarity": (best_sim_epoch, best_sim),
        "final_similarity": (final_epoch, sims[-1]),
        "best_modality_gap": (best_gap_epoch, best_gap),
        "final_modality_gap": (final_epoch, gaps[-1]),
    }


def compute_consistency_score(model, variables, dataloader) -> float:
    """Mean positive-pair cosine over a dataset (`my_metrics.py:208-245`)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def cosine(images, texts):
        out = model.apply(variables, images, texts)
        return jnp.sum(out["image_features"] * out["text_features"], axis=-1)

    total = 0.0
    count = 0
    for batch_dict in dataloader:
        sims = cosine(
            jnp.asarray(batch_dict["images"]), jnp.asarray(batch_dict["texts"])
        )
        total += float(np.asarray(sims).sum())
        count += sims.shape[0]
    return total / max(1, count)


def get_all_embeddings(
    model,
    variables,
    all_texts: Sequence[str],
    all_images: Sequence[str],
    root: str,
    preprocess,
    tokenizer,
    batch_size: int = 1024,
):
    """Batch-encode aligned caption/image-path lists → normalized features.

    Working replacement for the reference's broken implementation
    (`my_metrics.py:505-553` + dead generator `396-449`).
    """
    import jax
    import jax.numpy as jnp
    from PIL import Image

    @jax.jit
    def encode(images, texts):
        img = model.apply(variables, images, method="encode_image", normalize=True)
        txt = model.apply(variables, texts, method="encode_text", normalize=True)
        return img, txt

    text_embs, image_embs = [], []
    n = len(all_texts)
    for i in range(0, n, batch_size):
        texts = list(all_texts[i : i + batch_size])
        img_paths = list(all_images[i : i + batch_size])
        tokens = np.asarray(tokenizer(texts))
        imgs = np.stack(
            [
                preprocess(Image.open(os.path.join(root, p)).convert("RGB"))
                for p in img_paths
            ]
        )
        b = imgs.shape[0]
        if b < batch_size and i > 0:
            pad = batch_size - b
            imgs = np.concatenate([imgs, np.zeros((pad, *imgs.shape[1:]), imgs.dtype)])
            tokens = np.concatenate([tokens, np.zeros((pad, tokens.shape[1]), tokens.dtype)])
        img_e, txt_e = encode(jnp.asarray(imgs), jnp.asarray(tokens))
        image_embs.append(np.asarray(img_e, np.float32)[:b])
        text_embs.append(np.asarray(txt_e, np.float32)[:b])
    return np.concatenate(text_embs), np.concatenate(image_embs)
