"""Validation: val loss + Flickr-style retrieval (+ zero-shot hook).

Rebuild of `src/open_clip_train/train.py:588-760`: encode every val batch
with a jitted forward, accumulate features on host (the reference moves them
to CPU for the same reason — `train.py:662-664`), map caption rows to image
ids, dedup image features by first occurrence, then compute the retrieval
metrics that produce the thesis' headline numbers.
"""

from __future__ import annotations

import logging
import weakref
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import clip_loss
from .metrics import (
    build_unique_image_features,
    clip_retrieval_metrics,
    get_clip_metrics,
)


def _build_encode(model):
    @jax.jit
    def encode(variables, images, texts):
        out = model.apply(variables, images, texts)
        # per-ROW generative loss so the caller can drop padding rows added
        # for data-axis sharding before averaging
        gen_rows = maybe_compute_generative_loss(out, per_row=True)
        return out["image_features"], out["text_features"], out["logit_scale"], gen_rows

    return encode


# Cache the jitted encode per model object so repeated evaluate() calls
# (each epoch x each val key) reuse one traced program instead of rebuilding
# a fresh jit closure — and thus recompiling — every time. Keyed by identity
# (flax Modules with dict-bearing cfgs are unhashable); entries drop when the
# model is garbage-collected.
_ENCODE_CACHE: Dict[int, tuple] = {}


def _encode_fn(model):
    key = id(model)
    hit = _ENCODE_CACHE.get(key)
    if hit is not None and hit[0]() is model:
        return hit[1]
    fn = _build_encode(model)
    try:
        ref = weakref.ref(model, lambda _r, k=key: _ENCODE_CACHE.pop(k, None))
    except TypeError:
        ref = (lambda m: (lambda: m))(model)  # unweakrefable: keep alive
    _ENCODE_CACHE[key] = (ref, fn)
    return fn


def maybe_compute_generative_loss(model_out, per_row: bool = False):
    """CoCa caption CE when logits/labels present (`train.py:869-873`).
    `per_row=True` returns a [B] vector (mean over sequence positions per
    sample) so padding rows can be dropped before the batch average."""
    if "logits" in model_out and "labels" in model_out:
        logits = model_out["logits"].astype(jnp.float32)
        labels = model_out["labels"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        if per_row:
            return -jnp.mean(picked, axis=tuple(range(1, picked.ndim)))
        return -jnp.mean(picked)
    if per_row:
        return jnp.zeros((model_out["image_features"].shape[0],))
    return jnp.zeros(())


def evaluate(
    model,
    variables,
    data: Dict,
    epoch: int,
    args,
    tokenizer=None,
    val_key: str = "val",
    include_zero_shot: bool = True,
    mesh=None,
) -> Dict[str, float]:
    """When `mesh` is given, val batches are padded to a multiple of the
    data-axis size and sharded over it, so the encode runs GSPMD-partitioned
    across all chips (the reference evaluates on the master rank only,
    `train.py:593-595` — wasting world_size-1 accelerators); padding rows are
    sliced off before metrics, so results are identical to the 1-device path.
    """
    metrics: Dict[str, float] = {}

    # zero-shot ImageNet (frequency-gated inside). The caller iterates
    # evaluate() once per val key; pass include_zero_shot only on the first
    # so the classifier build + full ImageNet inference run ONCE per epoch
    # (the reference's single evaluate() call, `train.py:601`).
    if include_zero_shot:
        try:
            from .zero_shot import zero_shot_eval

            metrics.update(
                zero_shot_eval(model, variables, data, epoch, args, tokenizer,
                               mesh=mesh)
            )
        except ImportError:
            pass

    # reference train.py:607: val runs only when val_frequency is truthy AND
    # (epoch % val_frequency == 0 or final epoch) — val_frequency=0 skips.
    if val_key not in data:
        return metrics
    if not args.val_frequency:
        return metrics
    if not ((epoch % args.val_frequency) == 0 or epoch == args.epochs):
        return metrics

    loader = data[val_key].dataloader
    encode = _encode_fn(model)

    all_img, all_txt, all_ids = [], [], []
    path2id: Dict[str, int] = {}
    cumulative_loss = 0.0
    cumulative_gen_loss = 0.0
    num_samples = 0
    logit_scale = 1.0

    ndata = 1
    if mesh is not None:
        from ..parallel.mesh import DATA_AXIS, batch_sharding, put_full_batch

        ndata = int(mesh.shape[DATA_AXIS])
        shard = batch_sharding(mesh)

    for i, batch in enumerate(loader):
        images = np.asarray(batch["images"])
        texts = np.asarray(batch["texts"])
        b = images.shape[0]
        pad = (-b) % ndata
        if pad:
            # repeat the final row: every shard gets equal rows; outputs for
            # the padding rows are discarded below
            images = np.concatenate([images, np.repeat(images[-1:], pad, 0)])
            texts = np.concatenate([texts, np.repeat(texts[-1:], pad, 0)])
        if mesh is not None:
            # one sharded H2D per array; multi-host safe (val loaders are
            # not host-sharded — every process holds the full batch)
            images = put_full_batch(images, shard)
            texts = put_full_batch(texts, shard)
        else:
            images, texts = jnp.asarray(images), jnp.asarray(texts)
        img_f, txt_f, scale, gen_rows = encode(variables, images, texts)
        logit_scale = float(scale)
        img_f, txt_f = img_f[:b], txt_f[:b]
        cumulative_gen_loss += float(jnp.sum(gen_rows[:b]))

        all_img.append(np.asarray(img_f, np.float32))
        all_txt.append(np.asarray(txt_f, np.float32))
        if "image_path" in batch:
            for p in batch["image_path"]:
                if p not in path2id:
                    path2id[p] = len(path2id)
                all_ids.append(path2id[p])

        cumulative_loss += float(clip_loss(img_f, txt_f, scale)) * b
        num_samples += b
        if i % 100 == 0:
            logging.info(
                "Eval Epoch: %d [%d / %d]\tClip Loss: %.6f",
                epoch, num_samples, getattr(loader, "num_samples", -1),
                cumulative_loss / max(1, num_samples),
            )

    if not all_img:
        # degenerate val set (empty CSV / exhausted stream): report what we
        # have instead of crashing the run after a full epoch of training
        logging.warning("evaluate: val loader %r yielded no batches", val_key)
        return metrics

    img_feats_per_cap = np.concatenate(all_img, axis=0)
    txt_feats = np.concatenate(all_txt, axis=0)

    if all_ids:
        cap2img = np.asarray(all_ids, np.int64)
        img_feats = build_unique_image_features(img_feats_per_cap, cap2img)
        val_metrics = clip_retrieval_metrics(img_feats, txt_feats, cap2img)
    else:
        val_metrics = get_clip_metrics(img_feats_per_cap, txt_feats, logit_scale)

    metrics.update(val_metrics)
    metrics.update(
        {
            "clip_val_loss": cumulative_loss / max(1, num_samples),
            "epoch": epoch,
            "num_samples": num_samples,
        }
    )
    if cumulative_gen_loss != 0.0 and num_samples > 0:
        metrics["val_generative_loss"] = cumulative_gen_loss / num_samples
    logging.info(
        "Eval Epoch: %d %s",
        epoch,
        "\t".join(f"{k}: {round(v, 4):.4f}" for k, v in metrics.items()),
    )
    return metrics
