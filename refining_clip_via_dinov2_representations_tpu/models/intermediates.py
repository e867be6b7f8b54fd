"""Intermediate-feature extraction (`forward_intermediates` API family).

The reference threads an `indices` argument through every tower
(`transformer.py:492-523,825-896,1113-1185`, `model.py` wrappers). The flax
rebuild uses the idiomatic mechanism instead: `capture_intermediates`
collects every residual block's output in one pass, and this module
post-processes to the reference's output contract:

  image: dict(image_intermediates=[...], image_intermediates_prefix=[...],
              image_features=...)
  text:  dict(text_intermediates=[...], text_features=...)

Block selection follows `feature_take_indices` (`utils.py:94-132`): int n →
last n blocks, list → explicit indices.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Union

import jax.numpy as jnp

from ..utils import feature_take_indices
from .clip import l2_normalize

_BLOCK_RE = re.compile(r"resblocks_(\d+)$")


def _collect_block_outputs(intermediates: Dict, tower: str) -> List[jnp.ndarray]:
    """Pull per-resblock outputs for one tower from the captured tree,
    ordered by block index."""
    tree = intermediates.get(tower, {})
    transformer = tree.get("transformer", {})
    blocks = []
    for name, sub in transformer.items():
        m = _BLOCK_RE.match(name)
        if m and "__call__" in sub:
            blocks.append((int(m.group(1)), sub["__call__"][0]))
    return [x for _, x in sorted(blocks)]


def _filter_fn(mdl, method_name):
    return method_name == "__call__" and _BLOCK_RE.match(mdl.name or "") is not None


def forward_intermediates(
    model,
    variables,
    image: Optional[jnp.ndarray] = None,
    text: Optional[jnp.ndarray] = None,
    image_indices: Optional[Union[int, List[int]]] = None,
    text_indices: Optional[Union[int, List[int]]] = None,
    normalize: bool = True,
    intermediates_only: bool = False,
    image_output_fmt: str = "NCHW",
    image_output_extra_tokens: bool = False,
    output_logit_scale_bias: bool = False,
) -> Dict[str, Any]:
    """One-pass feature + intermediate extraction for a CLIP model."""
    out: Dict[str, Any] = {}

    features, state = model.apply(
        variables,
        image,
        text,
        capture_intermediates=_filter_fn,
        mutable=["intermediates"],
    )
    captured = state["intermediates"]

    if image is not None:
        blocks = _collect_block_outputs(captured, "visual")
        take, _ = feature_take_indices(len(blocks), image_indices)
        inter = [blocks[i] for i in take]
        # split CLS prefix, reshape spatial grid
        num_prefix = 1
        prefix = [y[:, :num_prefix] for y in inter]
        spatial = [y[:, num_prefix:] for y in inter]
        if image_output_fmt == "NCHW":
            ph, pw = model.vision_cfg.patch_size, model.vision_cfg.patch_size
            if isinstance(ph, (tuple, list)):
                ph, pw = ph
            h = image.shape[-3] if image.shape[-1] == 3 else image.shape[-2]
            w = image.shape[-2] if image.shape[-1] == 3 else image.shape[-1]
            gh, gw = h // ph, w // pw
            spatial = [
                jnp.transpose(y.reshape(y.shape[0], gh, gw, -1), (0, 3, 1, 2))
                for y in spatial
            ]
        out["image_intermediates"] = spatial
        if image_output_extra_tokens:
            out["image_intermediates_prefix"] = prefix
        if not intermediates_only and features.get("image_features") is not None:
            feats = features["image_features"]
            out["image_features"] = l2_normalize(feats) if normalize else feats

    if text is not None:
        blocks = _collect_block_outputs(captured, "text")
        take, _ = feature_take_indices(len(blocks), text_indices)
        out["text_intermediates"] = [blocks[i] for i in take]
        if not intermediates_only and features.get("text_features") is not None:
            feats = features["text_features"]
            out["text_features"] = l2_normalize(feats) if normalize else feats

    if output_logit_scale_bias and not intermediates_only:
        out["logit_scale"] = features["logit_scale"]
        if "logit_bias" in features:
            out["logit_bias"] = features["logit_bias"]
    return out
