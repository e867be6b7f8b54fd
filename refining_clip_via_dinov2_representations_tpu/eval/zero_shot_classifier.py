"""Zero-shot classifier construction.

JAX rebuild of `src/open_clip/zero_shot_classifier.py:21-109`: per class,
encode all prompt templates, mean over templates, renormalize; classes
processed in fixed-size batches through one jitted text encoder so every
batch reuses the same compiled program.
"""

from __future__ import annotations

from itertools import islice
from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def _batched(iterable, n):
    it = iter(iterable)
    while batch := tuple(islice(it, n)):
        yield batch


def build_zero_shot_classifier(
    model,
    variables,
    tokenizer,
    classnames: Sequence[str],
    templates: Sequence[Union[Callable, str]],
    num_classes_per_batch: Optional[int] = 10,
    use_tqdm: bool = False,
) -> jnp.ndarray:
    """Returns [embed_dim, num_classes] classifier weights."""
    assert isinstance(templates, Sequence) and len(templates) > 0
    assert isinstance(classnames, Sequence) and len(classnames) > 0
    use_format = isinstance(templates[0], str)
    num_templates = len(templates)

    @jax.jit
    def encode(texts):
        emb = model.apply(variables, texts, method="encode_text", normalize=True)
        emb = emb.reshape(-1, num_templates, emb.shape[-1]).mean(axis=1)
        return emb / jnp.linalg.norm(emb, axis=1, keepdims=True)

    def _process_batch(batch_classnames):
        texts = [
            template.format(c) if use_format else template(c)
            for c in batch_classnames
            for template in templates
        ]
        return encode(jnp.asarray(tokenizer(texts)))

    if num_classes_per_batch:
        batches = list(_batched(classnames, num_classes_per_batch))
        if use_tqdm:
            import tqdm

            batches = tqdm.tqdm(batches)
        # pad the last class batch so the jit signature stays constant
        embeds = []
        for batch in batches:
            n = len(batch)
            padded = tuple(batch) + (batch[-1],) * (num_classes_per_batch - n)
            embeds.append(np.asarray(_process_batch(padded))[:n])
        weights = np.concatenate(embeds, axis=0).T
    else:
        weights = np.asarray(_process_batch(tuple(classnames))).T
    return jnp.asarray(weights)


def build_zero_shot_classifier_legacy(
    model,
    variables,
    tokenizer,
    classnames: Sequence[str],
    templates: Sequence[Union[Callable, str]],
    use_tqdm: bool = False,
) -> jnp.ndarray:
    """One-class-at-a-time variant (`zero_shot_classifier.py:71-109`)."""
    return build_zero_shot_classifier(
        model, variables, tokenizer, classnames, templates,
        num_classes_per_batch=1, use_tqdm=use_tqdm,
    )
