"""open_clip-style loss classes + `create_loss` factory (API compatibility).

The native API in this package is functional — pure `clip_loss(...)` etc.
consumed inside the pjit'd train step (`train/step.py`), with collectives
selected by `axis_name`. Reference users, however, import loss *classes*
(`open_clip.ClipLoss(...)`) and a `create_loss(args)` factory
(`src/open_clip/factory.py:506-588`); this module provides those names as
thin, tested adapters over the functional losses.

Distributed-torch constructor knobs (`rank`, `world_size`, `use_horovod`,
`gather_with_grad`, `cache_labels`) are accepted for signature parity and
validated rather than emulated: there is no process-group state in JAX —
cross-device negatives come from running the functional loss under
`shard_map` with an `axis_name` (pass it here as `axis_name=`). With
`world_size=1` (the only world these adapters run in outside pjit) every
reference gather short-circuits (`loss.py:121,140-142,678`), so semantics
are exact.

Return conventions mirror the reference per class (dict when
`output_dict=True`, scalar/tuple otherwise), including
`ClipLossWithDINOEnhancements`'s fall-off-the-end `None` quirk
(`loss.py:597-607`) — documented there, kept here.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

from .contrastive import (
    clip_loss,
    coca_loss,
    cyclip_loss,
    distill_clip_loss,
    siglip_loss,
)
from .dino import DinoLossCfg, dino_enhanced_loss


def _check_dist_args(world_size: int, use_horovod: bool, axis_name):
    if use_horovod:
        raise ValueError(
            "use_horovod has no JAX analogue — one runtime covers every "
            "device; run the functional loss under shard_map instead"
        )
    if world_size != 1 and axis_name is None:
        raise ValueError(
            "world_size>1 without axis_name: JAX has no implicit process "
            "group. Run this loss inside shard_map/pjit and pass "
            "axis_name='data' (see train/step.py)"
        )


class ClipLoss:
    """`open_clip.ClipLoss` (`loss.py:84-159`)."""

    def __init__(self, local_loss=False, gather_with_grad=False,
                 cache_labels=False, rank=0, world_size=1, use_horovod=False,
                 axis_name: Optional[str] = None):
        _check_dist_args(world_size, use_horovod, axis_name)
        # gather_with_grad: lax.all_gather carries gradients by construction,
        # so both settings produce the differentiable gather (the reference's
        # non-grad path exists only as a torch workaround, SURVEY §2.6)
        self.local_loss = local_loss
        self.axis_name = axis_name

    def __call__(self, image_features, text_features, logit_scale,
                 output_dict: bool = False):
        loss = clip_loss(
            image_features, text_features, logit_scale,
            axis_name=self.axis_name, local_loss=self.local_loss,
        )
        return {"contrastive_loss": loss} if output_dict else loss


class CoCaLoss(ClipLoss):
    """`open_clip.CoCaLoss` (`loss.py:761-811`)."""

    def __init__(self, caption_loss_weight, clip_loss_weight, pad_id=0,
                 local_loss=False, gather_with_grad=False, cache_labels=False,
                 rank=0, world_size=1, use_horovod=False,
                 axis_name: Optional[str] = None):
        super().__init__(local_loss=local_loss, world_size=world_size,
                         use_horovod=use_horovod, axis_name=axis_name)
        self.caption_loss_weight = caption_loss_weight
        self.clip_loss_weight = clip_loss_weight
        self.pad_id = pad_id

    def __call__(self, image_features, text_features, logits, labels,
                 logit_scale, output_dict: bool = False):
        out = coca_loss(
            image_features, text_features, logits, labels, logit_scale,
            caption_loss_weight=self.caption_loss_weight,
            clip_loss_weight=self.clip_loss_weight, pad_id=self.pad_id,
            axis_name=self.axis_name, local_loss=self.local_loss,
        )
        if output_dict:
            return out
        return out["contrastive_loss"], out["caption_loss"]


class DistillClipLoss(ClipLoss):
    """`open_clip.DistillClipLoss` (`loss.py:907-949`)."""

    def __call__(self, image_features, text_features, logit_scale,
                 dist_image_features, dist_text_features, dist_logit_scale,
                 output_dict: bool = False):
        out = distill_clip_loss(
            image_features, text_features, logit_scale,
            dist_image_features, dist_text_features, dist_logit_scale,
            axis_name=self.axis_name, local_loss=self.local_loss,
        )
        if output_dict:
            return out
        return out["contrastive_loss"], out["distill_loss"]


class SigLipLoss:
    """`open_clip.SigLipLoss` (`loss.py:610-756`)."""

    def __init__(self, cache_labels=False, rank=0, world_size=1, bidir=True,
                 dist_impl: Optional[str] = None,
                 axis_name: Optional[str] = None):
        _check_dist_args(world_size, False, axis_name)
        self.dist_impl = dist_impl or ("bidir" if bidir else "shift")
        self.axis_name = axis_name
        self.world_size = world_size

    def __call__(self, image_features, text_features, logit_scale, logit_bias,
                 output_dict: bool = False):
        loss = siglip_loss(
            image_features, text_features, logit_scale, logit_bias,
            axis_name=self.axis_name, axis_size=self.world_size,
            dist_impl=self.dist_impl,
        )
        return {"contrastive_loss": loss} if output_dict else loss


class CyCLIPLoss(ClipLoss):
    """Fork's `CyCLIPLoss` (`loss.py:814-905`)."""

    def __init__(self, lambda_inmodal=0.25, lambda_crossmodal=0.25, **kw):
        super().__init__(**kw)
        self.lambda_inmodal = lambda_inmodal
        self.lambda_crossmodal = lambda_crossmodal

    def __call__(self, image_features, text_features, logit_scale,
                 output_dict: bool = False):
        out = cyclip_loss(
            image_features, text_features, logit_scale,
            lambda_inmodal=self.lambda_inmodal,
            lambda_crossmodal=self.lambda_crossmodal,
            axis_name=self.axis_name, local_loss=self.local_loss,
        )
        if output_dict:
            return {
                "total_loss": out["total_loss"],
                "clip_loss": out["clip_loss"],
                "inmodal_cyclic": out["inmodal_cyclic"],
                "crossmodal_cyclic": out["crossmodal_cyclic"],
                "lambda_inmodal": self.lambda_inmodal,
                "lambda_crossmodal": self.lambda_crossmodal,
            }
        return out["total_loss"]


class ClipLossWithDINOEnhancements(ClipLoss):
    """Fork's thesis loss (`loss.py:190-607`) over `dino_enhanced_loss`.

    The reference lazily creates an in-loss projection head that is never
    optimized (SURVEY §2.2 quirk). Here the head is a real param subtree
    (`DinoProjectionHead`) owned by the train step; this adapter therefore
    accepts a precomputed `image_proj` instead of creating one — pass
    `cfg.use_projection=False` (default) or supply `image_proj`.
    """

    def __init__(self, cfg: Optional[DinoLossCfg] = None, local_loss=False,
                 gather_with_grad=False, cache_labels=False, rank=0,
                 world_size=1, use_horovod=False,
                 axis_name: Optional[str] = None):
        super().__init__(local_loss=local_loss, world_size=world_size,
                         use_horovod=use_horovod, axis_name=axis_name)
        self.cfg = cfg or DinoLossCfg()

    def __call__(self, image_features, text_features, logit_scale,
                 dino_features=None, image_proj=None, args=None,
                 output_dict: bool = False):
        cfg = self.cfg
        if args is not None:  # reference passes per-step knobs via `args`
            overrides = {
                f.name: getattr(args, f.name)
                for f in cfg.__dataclass_fields__.values()
                if hasattr(args, f.name)
            }
            import dataclasses

            cfg = dataclasses.replace(cfg, **overrides)
        if cfg.use_projection and image_proj is None:
            raise ValueError(
                "use_projection: apply DinoProjectionHead to image_features "
                "and pass the result as image_proj (the head is a real "
                "optimized subtree here, unlike the reference's "
                "never-optimized lazy head — SURVEY §2.2)"
            )
        out = dino_enhanced_loss(
            image_features, text_features, logit_scale, dino_features, cfg,
            image_proj=image_proj, axis_name=self.axis_name,
        )
        if output_dict:
            return out
        # reference quirk kept: without output_dict the forward falls off
        # the end and returns None (`loss.py:597-607`)
        return None


def create_loss(args: Any):
    """`open_clip.create_loss` (`factory.py:506-588`): argparse-driven
    dispatch to the class adapters above, same precedence order."""
    get = lambda k, d=None: getattr(args, k, d)
    common = dict(
        local_loss=bool(get("local_loss", False)),
        world_size=int(get("world_size", 1)),
        axis_name=get("axis_name"),
    )
    if get("distill"):
        return DistillClipLoss(**common)
    if "coca" in str(get("model", "")).lower() or get("use_coca"):
        return CoCaLoss(
            caption_loss_weight=get("coca_caption_loss_weight", 2.0),
            clip_loss_weight=get("coca_contrastive_loss_weight", 1.0),
            **common,
        )
    if get("siglip"):
        return SigLipLoss(
            world_size=common["world_size"], axis_name=common["axis_name"],
            dist_impl=get("loss_dist_impl") or "bidir",
        )
    if get("use_CyClip") or get("use_cyclip"):
        return CyCLIPLoss(
            lambda_inmodal=get("lambda_cyc_inmodal", 0.25),
            lambda_crossmodal=get("lambda_cyc_crossmodal", 0.25),
            **common,
        )
    if get("use_dino_general"):
        cfg_fields = DinoLossCfg.__dataclass_fields__
        cfg = DinoLossCfg(**{
            k: getattr(args, k) for k in cfg_fields if hasattr(args, k)
        })
        return ClipLossWithDINOEnhancements(cfg=cfg, **common)
    return ClipLoss(**common)
