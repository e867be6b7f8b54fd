"""ImageNet zero-shot evaluation (`src/open_clip_train/zero_shot.py`).

Builds the 80-template prompt-ensemble classifier once per eval, then scores
`100 · image_features @ classifier` per batch with a jitted forward.
Frequency-gated like the reference (`zero_shot.py:45-52`).
"""

from __future__ import annotations

import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..eval._imagenet_metadata import (
    IMAGENET_CLASSNAMES,
    OPENAI_IMAGENET_TEMPLATES,
)
from ..eval.zero_shot_classifier import build_zero_shot_classifier


def accuracy(logits: np.ndarray, target: np.ndarray, topk=(1,)):
    """Top-k correct counts (`zero_shot.py:11-14`)."""
    order = np.argsort(-logits, axis=1)
    out = []
    for k in topk:
        hit = (order[:, :k] == target[:, None]).any(axis=1)
        out.append(float(hit.sum()))
    return out


# one jitted scorer per model (variables + classifier are ARGUMENTS, not
# closure constants): zero-shot runs once or twice per epoch, and a
# closure-captured classifier would bake a fresh constant into a brand-new
# XLA program every call — tens of seconds of recompiles per epoch on TPU
# (same pattern as evaluate._ENCODE_CACHE)
_SCORE_CACHE: Dict[int, object] = {}


def _score_fn(model):
    key = id(model)
    if key not in _SCORE_CACHE:
        @jax.jit
        def score(variables, images, classifier):
            feats = model.apply(
                variables, images, method="encode_image", normalize=True
            )
            return 100.0 * feats @ classifier

        _SCORE_CACHE[key] = score
    return _SCORE_CACHE[key]


def run(model, variables, classifier, dataloader, args, mesh=None):
    """`mesh` shards each (padded) image batch over the data axis so the
    50k-image ImageNet sweep runs on every chip instead of one (the
    reference's zero-shot is master-rank-only); padded rows are sliced off
    before accuracy, so results match the 1-device path exactly."""
    score = _score_fn(model)
    classifier = jnp.asarray(classifier)

    ndata = 1
    if mesh is not None:
        from ..parallel.mesh import DATA_AXIS, batch_sharding, put_full_batch

        ndata = int(mesh.shape[DATA_AXIS])
        shard = batch_sharding(mesh)

    top1 = top5 = n = 0.0
    for batch in dataloader:
        images = np.asarray(batch["images"])
        target = np.asarray(batch["labels"])
        b = images.shape[0]
        pad = (-b) % ndata
        if pad:
            images = np.concatenate([images, np.repeat(images[-1:], pad, 0)])
        if mesh is not None:
            # one sharded H2D; multi-host safe (loader is not host-sharded)
            images = put_full_batch(images, shard)
        else:
            images = jnp.asarray(images)
        logits = np.asarray(score(variables, images, classifier))[:b]
        acc1, acc5 = accuracy(logits, target, topk=(1, 5))
        top1 += acc1
        top5 += acc5
        n += b
    if n == 0:  # empty/degenerate ImageNet folder: skip, don't kill the run
        logging.warning("zero-shot loader yielded no samples; skipping")
        return float("nan"), float("nan")
    return top1 / n, top5 / n


def zero_shot_eval(model, variables, data, epoch, args, tokenizer=None, mesh=None) -> Dict[str, float]:
    if "imagenet-val" not in data and "imagenet-v2" not in data:
        return {}
    if args.zeroshot_frequency == 0:
        return {}
    if (epoch % args.zeroshot_frequency) != 0 and epoch != args.epochs:
        return {}

    logging.info("Starting zero-shot imagenet.")
    if tokenizer is None:
        from ..models import get_tokenizer

        tokenizer = get_tokenizer(args.model)

    logging.info("Building zero-shot classifier")
    classifier = build_zero_shot_classifier(
        model,
        variables,
        tokenizer=tokenizer,
        classnames=IMAGENET_CLASSNAMES,
        templates=OPENAI_IMAGENET_TEMPLATES,
        num_classes_per_batch=10,
    )

    results = {}
    if "imagenet-val" in data:
        top1, top5 = run(model, variables, classifier, data["imagenet-val"].dataloader, args, mesh=mesh)
        results["imagenet-zeroshot-val-top1"] = top1
        results["imagenet-zeroshot-val-top5"] = top5
    if "imagenet-v2" in data:
        top1, top5 = run(model, variables, classifier, data["imagenet-v2"].dataloader, args, mesh=mesh)
        results["imagenetv2-zeroshot-val-top1"] = top1
        results["imagenetv2-zeroshot-val-top5"] = top5
    logging.info("Finished zero-shot imagenet.")
    return results
