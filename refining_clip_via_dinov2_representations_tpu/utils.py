"""Misc utilities (`src/open_clip/utils.py` + `pos_embed.py` counterparts)."""

from __future__ import annotations

import collections.abc
from itertools import repeat
from typing import List, Optional, Tuple, Union

import numpy as np


def _ntuple(n):
    def parse(x):
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            return tuple(x)
        return tuple(repeat(x, n))

    return parse


to_1tuple = _ntuple(1)
to_2tuple = _ntuple(2)
to_3tuple = _ntuple(3)
to_4tuple = _ntuple(4)


def feature_take_indices(
    num_features: int,
    indices: Optional[Union[int, List[int]]] = None,
) -> Tuple[List[int], int]:
    """Resolve intermediate-feature indices (`utils.py:94-132`): int n → last
    n blocks; list → as given (negatives allowed); None → all."""
    if indices is None:
        indices = num_features
    if isinstance(indices, int):
        assert 0 < indices <= num_features
        take = [num_features - indices + i for i in range(indices)]
    else:
        take = [num_features + i if i < 0 else i for i in indices]
        assert all(0 <= i < num_features for i in take)
    return take, max(take)


# NOTE on `freeze_batch_norm_2d` (reference utils.py:11-47): there is no tree
# transformation here on purpose. Batch-norm statistics live in the flax
# `batch_stats` collection and the train step updates them every step for BN
# towers (torch train-mode parity); `--lock-image-freeze-bn-stats` (→
# `StepCfg.freeze_bn_stats`) makes BN normalize with the stored running
# averages and leave them untouched — freezing is a step-config choice.


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False) -> np.ndarray:
    """Fixed 2D sin-cos position embedding (`pos_embed.py:20-72`)."""
    from .models.transformer import get_2d_sincos_pos_embed as _impl

    return _impl(embed_dim, grid_size, cls_token=cls_token)
