"""The two-tower CLIP model as a flax module.

Covers both reference variants (`CLIP` `model.py:293-584` and
`CustomTextCLIP` `model.py:587-788`) with one module: in JAX there is no
shared-vs-encapsulated namespace distinction — the text tower is always the
`text` submodule and the checkpoint converter flattens either torch layout
onto it.

Forward contract matches the reference with `output_dict=True`
(`model.py:566-576`): a dict of L2-normalized `image_features`,
`text_features`, exponentiated `logit_scale` and optional `logit_bias`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .config import CLIPModelCfg, CLIPTextCfg, CLIPVisionCfg, to_2tuple
from .layers import get_act_fn
from .transformer import TextTransformer, VisionTransformer

Dtype = Any

DEFAULT_INIT_LOGIT_SCALE = math.log(1 / 0.07)  # model.py:302


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize parity: divide by max(norm, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def _remat_args(remat):
    """Split the `remat` knob into (enabled, policy_name).

    `remat` is either a bool (full recompute when True) or the name of a
    `jax.checkpoint` policy ("dots_saveable" /
    "dots_with_no_batch_dims_saveable") — selective rematerialization that
    saves matmul outputs and recomputes only cheap elementwise ops, trading
    a little memory for most of the recompute FLOPs. Every tower family
    threads the policy to its block remat wrapper.
    """
    if isinstance(remat, str):
        return True, remat
    return bool(remat), "full"


def _build_vision_tower(
    embed_dim: int,
    cfg: CLIPVisionCfg,
    quick_gelu: bool,
    dtype,
    attn_impl: str,
    remat,
    name: str = "visual",
) -> nn.Module:
    remat, remat_policy = _remat_args(remat)
    if cfg.timm_model_name is not None:
        from .siglip import SiglipVisionCfg, SiglipVisionTower, parse_siglip_timm_name

        dims = parse_siglip_timm_name(cfg.timm_model_name)
        if dims is not None:
            if dims["width"] != embed_dim and (cfg.timm_proj in (None, "none")):
                raise NotImplementedError(
                    f"SigLIP tower {cfg.timm_model_name!r} width {dims['width']} != "
                    f"embed_dim {embed_dim} without a projection"
                )
            # honor the config's image_size override (e.g. -378 variants)
            img = to_2tuple(cfg.image_size)[0]
            return SiglipVisionTower(
                cfg=SiglipVisionCfg(
                    width=dims["width"], layers=dims["layers"], heads=dims["heads"],
                    mlp_dim=dims["mlp_dim"], patch_size=dims["patch_size"],
                    image_size=img,
                ),
                output_tokens=cfg.output_tokens,
                dtype=dtype,
                attn_impl=attn_impl,
                remat=remat,
                remat_policy=remat_policy,
                name=name,
            )
        from .eva import EVA01_DIMS

        if cfg.timm_model_name in EVA01_DIMS:
            width, layers, heads, mlp_ratio, patch = EVA01_DIMS[cfg.timm_model_name]
            return VisionTransformer(
                image_size=to_2tuple(cfg.image_size),
                patch_size=to_2tuple(patch),
                width=width,
                layers=layers,
                heads=heads,
                mlp_ratio=mlp_ratio,
                output_dim=embed_dim,
                no_ln_pre=True,
                pool_type="tok",
                proj_bias=True,
                patch_embed_bias=True,
                act=get_act_fn("gelu"),
                norm_eps=1e-6,
                output_tokens=cfg.output_tokens,
                dtype=dtype,
                attn_impl=attn_impl,
                remat=remat,
                remat_policy=remat_policy,
                name=name,
            )

        from .eva02 import EVA02_DIMS, Eva02VisionTower

        if cfg.timm_model_name in EVA02_DIMS:
            e_cfg = EVA02_DIMS[cfg.timm_model_name]
            img = to_2tuple(cfg.image_size)[0]
            if img != e_cfg.image_size:
                e_cfg = dataclasses.replace(e_cfg, image_size=img)
            return Eva02VisionTower(
                cfg=e_cfg,
                output_dim=embed_dim,
                output_tokens=cfg.output_tokens,
                dtype=dtype,
                attn_impl=attn_impl,
                remat=remat,
                remat_policy=remat_policy,
                name=name,
            )

        # plain-timm ViT variants used by a handful of configs
        # (timm vision_transformer.py model args; GAP family: class_token
        # False, qkv_bias False, LayerScale 1e-6, global avg pool)
        TIMM_PLAIN_VIT = {
            "vit_medium_patch16_gap_256": dict(
                width=512, layers=12, heads=8, patch=16,
                class_token=False, pool_type="avg", qkv_bias=False,
                ls_init_value=1e-6,
            ),
        }
        from .vitamin import VITAMIN_DIMS, ViTaminVisionTower

        if cfg.timm_model_name in VITAMIN_DIMS:
            vt_cfg = VITAMIN_DIMS[cfg.timm_model_name]
            img = to_2tuple(cfg.image_size)[0]
            if img != vt_cfg.image_size:
                vt_cfg = dataclasses.replace(vt_cfg, image_size=img)
            return ViTaminVisionTower(
                cfg=vt_cfg,
                output_dim=embed_dim,
                proj_bias=cfg.timm_proj_bias,
                output_tokens=cfg.output_tokens,
                dtype=dtype,
                attn_impl=attn_impl,
                remat=remat,
                remat_policy=remat_policy,
                name=name,
            )

        if cfg.timm_model_name == "vit_relpos_medium_patch16_cls_224":
            from .relpos_vit import RelPosVisionTower

            return RelPosVisionTower(
                width=512, layers=12, heads=8, patch_size=16,
                image_size=to_2tuple(cfg.image_size)[0],
                output_dim=embed_dim,
                output_tokens=cfg.output_tokens,
                dtype=dtype, attn_impl=attn_impl, remat=remat,
                remat_policy=remat_policy, name=name,
            )
        if cfg.timm_model_name in TIMM_PLAIN_VIT:
            d = TIMM_PLAIN_VIT[cfg.timm_model_name]
            return VisionTransformer(
                image_size=to_2tuple(cfg.image_size),
                patch_size=to_2tuple(d["patch"]),
                width=d["width"],
                layers=d["layers"],
                heads=d["heads"],
                output_dim=embed_dim,
                class_token=d["class_token"],
                pool_type=d["pool_type"],
                qkv_bias=d["qkv_bias"],
                ls_init_value=d["ls_init_value"],
                no_ln_pre=True,
                patch_embed_bias=True,
                act=get_act_fn("gelu"),
                norm_eps=1e-6,
                output_tokens=cfg.output_tokens,
                dtype=dtype,
                attn_impl=attn_impl,
                remat=remat,
                remat_policy=remat_policy,
                name=name,
            )

        from .swin import SWIN_DIMS, SwinVisionTower

        if cfg.timm_model_name in SWIN_DIMS:
            s_cfg = SWIN_DIMS[cfg.timm_model_name]
            img = to_2tuple(cfg.image_size)[0]
            if img != s_cfg.image_size:
                s_cfg = dataclasses.replace(s_cfg, image_size=img)
            return SwinVisionTower(
                cfg=s_cfg,
                output_dim=embed_dim,
                proj_bias=cfg.timm_proj_bias,
                output_tokens=cfg.output_tokens,
                dtype=dtype,
                attn_impl=attn_impl,
                remat=remat,
                remat_policy=remat_policy,
                name=name,
            )

        from .convnext import CONVNEXT_DIMS, ConvNextCfg, ConvNextTower

        if cfg.timm_model_name in CONVNEXT_DIMS:
            depths, dims = CONVNEXT_DIMS[cfg.timm_model_name]
            return ConvNextTower(
                cfg=ConvNextCfg(depths=depths, dims=dims),
                output_dim=embed_dim,
                proj_type=cfg.timm_proj or "linear",
                proj_bias=cfg.timm_proj_bias,
                output_tokens=cfg.output_tokens,
                dtype=dtype,
                remat=remat,
                remat_policy=remat_policy,
                name=name,
            )
        from .fastvit import FASTVIT_DIMS, FastVitTower, MciVisionTransformer

        if cfg.timm_model_name in FASTVIT_DIMS:
            f_cfg = FASTVIT_DIMS[cfg.timm_model_name]
            img = to_2tuple(cfg.image_size)[0]
            if img != f_cfg.image_size:
                f_cfg = dataclasses.replace(f_cfg, image_size=img)
            return FastVitTower(
                cfg=f_cfg,
                output_dim=embed_dim,
                output_tokens=cfg.output_tokens,
                dtype=dtype,
                remat=remat,
                remat_policy=remat_policy,
                name=name,
            )
        if cfg.timm_model_name == "vit_base_mci_224":
            return MciVisionTransformer(
                image_size=to_2tuple(cfg.image_size)[0],
                output_dim=embed_dim,
                output_tokens=cfg.output_tokens,
                dtype=dtype,
                attn_impl=attn_impl,
                remat=remat,
                remat_policy=remat_policy,
                name=name,
            )
        # every timm name the 126-config registry uses resolves above; only
        # names OUTSIDE the registry land here (the reference wraps any timm
        # trunk, timm_model.py:23-198 — this rebuild scopes to native ports)
        from .convnext import CONVNEXT_DIMS as _cn
        from .eva import EVA01_DIMS as _e1
        from .eva02 import EVA02_DIMS as _e2
        from .fastvit import FASTVIT_DIMS as _fv
        from .swin import SWIN_DIMS as _sw
        from .vitamin import VITAMIN_DIMS as _vt

        supported = sorted(
            set(_e1) | set(_e2) | set(_cn) | set(_fv) | set(_sw) | set(_vt)
            | set(TIMM_PLAIN_VIT)
            | {"vit_base_mci_224", "vit_relpos_medium_patch16_cls_224"}
        )
        raise NotImplementedError(
            f"timm vision tower {cfg.timm_model_name!r} has no TPU-native "
            "port. Natively-ported families: SigLIP ViTs "
            "(vit_*_siglip_* via pattern), EVA01/EVA02, ConvNeXt, Swin, "
            "ViTamin, FastViT/MCi, GAP/relpos ViTs — every timm name in the "
            "126-config registry resolves. Explicitly supported names: "
            f"{supported}. Arbitrary timm trunks (reference "
            "timm_model.py:23-198) are out of scope; add a native port or "
            "open the capability matrix in COMPONENTS.md."
        )
    if cfg.is_resnet:
        from .resnet import ModifiedResNet

        vision_heads = cfg.width * 32 // cfg.head_width
        return ModifiedResNet(
            layers=tuple(cfg.layers),
            output_dim=embed_dim,
            heads=vision_heads,
            image_size=to_2tuple(cfg.image_size)[0],
            width=cfg.width,
            dtype=dtype,
            name=name,
        )
    act = get_act_fn("quick_gelu" if quick_gelu else "gelu")
    if cfg.act_kwargs:  # e.g. {"approximate": "tanh"} — map onto tanh-gelu
        if cfg.act_kwargs.get("approximate") == "tanh":
            act = get_act_fn("gelu_tanh")
    norm_eps = (cfg.norm_kwargs or {}).get("eps", 1e-5)
    return VisionTransformer(
        image_size=to_2tuple(cfg.image_size),
        patch_size=to_2tuple(cfg.patch_size),
        width=cfg.width,
        layers=cfg.layers,
        heads=cfg.heads,
        mlp_ratio=cfg.mlp_ratio,
        ls_init_value=cfg.ls_init_value,
        attentional_pool=cfg.attentional_pool,
        attn_pooler_queries=cfg.attn_pooler_queries,
        attn_pooler_heads=cfg.attn_pooler_heads,
        output_dim=embed_dim,
        patch_dropout=cfg.patch_dropout,
        no_ln_pre=cfg.no_ln_pre,
        pos_embed_type=cfg.pos_embed_type,
        pool_type=cfg.pool_type,
        final_ln_after_pool=cfg.final_ln_after_pool,
        act=act,
        norm_eps=norm_eps,
        output_tokens=cfg.output_tokens,
        dtype=dtype,
        attn_impl=attn_impl,
        remat=remat,
        remat_policy=remat_policy,
        name=name,
    )


def _build_text_tower(
    embed_dim: int,
    cfg: CLIPTextCfg,
    quick_gelu: bool,
    dtype,
    attn_impl: str,
    remat,
    name: str = "text",
) -> nn.Module:
    remat, remat_policy = _remat_args(remat)
    if cfg.hf_model_name is not None:
        from .hf_model import build_hf_text_tower

        try:
            # weight-free construction — create_model overlays the hub
            # weights post-init (factory.load_hf_pretrained_text_params)
            # when cfg.hf_model_pretrained is set
            tower, _ = build_hf_text_tower(
                cfg.hf_model_name,
                output_dim=embed_dim,
                proj_type=cfg.hf_proj_type,
                pooler_type=cfg.hf_pooler_type if cfg.hf_pooler_type else None,
                pretrained=False,
                dtype=dtype,
                output_tokens=cfg.output_tokens,  # CoCa towers return tokens
            )
        except OSError as e:
            raise RuntimeError(
                f"HF text tower {cfg.hf_model_name!r} needs hub-cached files "
                f"(zero-egress environments must pre-download): {e}"
            ) from e
        return tower
    act = get_act_fn("quick_gelu" if quick_gelu else "gelu")
    if cfg.act_kwargs and cfg.act_kwargs.get("approximate") == "tanh":
        act = get_act_fn("gelu_tanh")
    norm_eps = (cfg.norm_kwargs or {}).get("eps", 1e-5)
    return TextTransformer(
        context_length=cfg.context_length,
        vocab_size=cfg.vocab_size,
        width=cfg.width,
        heads=cfg.heads,
        layers=cfg.layers,
        mlp_ratio=cfg.mlp_ratio,
        ls_init_value=cfg.ls_init_value,
        output_dim=embed_dim,
        embed_cls=cfg.embed_cls,
        no_causal_mask=cfg.no_causal_mask,
        pad_id=cfg.pad_id,
        pool_type=cfg.pool_type,
        proj_type=cfg.proj_type,
        proj_bias=cfg.proj_bias,
        act=act,
        norm_eps=norm_eps,
        output_tokens=cfg.output_tokens,
        dtype=dtype,
        attn_impl=attn_impl,
        remat=remat,
        remat_policy=remat_policy,
        name=name,
    )


class CLIP(nn.Module):
    """Two-tower contrastive model.

    Attributes mirror `create_model`'s knobs; `dtype` is the compute dtype
    (bf16 on TPU), parameters stay fp32.
    """

    embed_dim: int
    vision_cfg: CLIPVisionCfg
    text_cfg: CLIPTextCfg
    quick_gelu: bool = False
    init_logit_scale: float = DEFAULT_INIT_LOGIT_SCALE
    init_logit_bias: Optional[float] = None
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    # bool, or a jax.checkpoint policy name (see _remat_args)
    remat: Any = False

    def setup(self):
        self.visual = _build_vision_tower(
            self.embed_dim, self.vision_cfg, self.quick_gelu, self.dtype,
            self.attn_impl, self.remat,
        )
        self.text = _build_text_tower(
            self.embed_dim, self.text_cfg, self.quick_gelu, self.dtype,
            self.attn_impl, self.remat,
        )
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(self.init_logit_scale),
            (),
            jnp.float32,
        )
        if self.init_logit_bias is not None:
            self.logit_bias = self.param(
                "logit_bias",
                nn.initializers.constant(self.init_logit_bias),
                (),
                jnp.float32,
            )
        else:
            self.logit_bias = None

    # -- encoders ----------------------------------------------------------
    def encode_image(
        self, image: jnp.ndarray, normalize: bool = False, deterministic: bool = True
    ) -> jnp.ndarray:
        features = self.visual(image, deterministic=deterministic)
        if isinstance(features, tuple):  # output_tokens configs
            features = features[0]
        return l2_normalize(features) if normalize else features

    def encode_text(
        self, text: jnp.ndarray, normalize: bool = False, deterministic: bool = True
    ) -> jnp.ndarray:
        features = self.text(text, deterministic=deterministic)
        if isinstance(features, tuple):
            features = features[0]
        return l2_normalize(features) if normalize else features

    def get_logits(self, image: jnp.ndarray, text: jnp.ndarray):
        """Paired logits (`model.py:435-442`)."""
        image_features = self.encode_image(image, normalize=True)
        text_features = self.encode_text(text, normalize=True)
        image_logits = jnp.exp(self.logit_scale) * image_features @ text_features.T
        if self.logit_bias is not None:
            image_logits = image_logits + self.logit_bias
        return image_logits, image_logits.T

    def __call__(
        self,
        image: Optional[jnp.ndarray] = None,
        text: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        out = {
            "image_features": self.encode_image(
                image, normalize=True, deterministic=deterministic
            )
            if image is not None
            else None,
            "text_features": self.encode_text(
                text, normalize=True, deterministic=deterministic
            )
            if text is not None
            else None,
            "logit_scale": jnp.exp(self.logit_scale),
        }
        if self.logit_bias is not None:
            out["logit_bias"] = self.logit_bias
        return out


def build_model(
    cfg: CLIPModelCfg,
    dtype=jnp.float32,
    attn_impl: str = "xla",
    remat=False,
    force_quick_gelu: bool = False,
) -> CLIP:
    """Instantiate the flax CLIP module from a parsed registry config.

    `remat` is a bool (per-block full-recompute activation checkpointing)
    or a `jax.checkpoint` policy name — "dots_saveable" /
    "dots_with_no_batch_dims_saveable" — for selective rematerialization
    (matmul outputs saved, only elementwise ops recomputed).
    """
    if cfg.multimodal_cfg is not None:
        from .coca import CoCa

        module = CoCa(
            embed_dim=cfg.embed_dim,
            vision_cfg=cfg.vision_cfg,
            text_cfg=cfg.text_cfg,
            multimodal_cfg=cfg.multimodal_cfg,
            quick_gelu=cfg.quick_gelu or force_quick_gelu,
            init_logit_scale=cfg.init_logit_scale or DEFAULT_INIT_LOGIT_SCALE,
            init_logit_bias=cfg.init_logit_bias,
            dtype=dtype,
            attn_impl=attn_impl,
            remat=remat,
        )
    else:
        module = CLIP(
            embed_dim=cfg.embed_dim,
            vision_cfg=cfg.vision_cfg,
            text_cfg=cfg.text_cfg,
            quick_gelu=cfg.quick_gelu or force_quick_gelu,
            init_logit_scale=cfg.init_logit_scale or DEFAULT_INIT_LOGIT_SCALE,
            init_logit_bias=cfg.init_logit_bias,
            dtype=dtype,
            attn_impl=attn_impl,
            remat=remat,
        )
    # Sidecar recording whether the reference factory would have built
    # CustomTextCLIP/CoCa for this config (`factory.py:398-414`): config
    # flag, HF text tower, or a multimodal (CoCa) head. Lock/param-group
    # semantics in the trainer key off this (CustomTextCLIP delegates text
    # locking to TextTransformer.lock and has no `model.transformer`), and
    # reading it off the BUILT module means hf-hub:/unregistered configs
    # resolve without a registry lookup.
    object.__setattr__(
        module,
        "_custom_text",
        bool(
            cfg.custom_text
            or cfg.text_cfg.hf_model_name
            or cfg.multimodal_cfg is not None
        ),
    )
    return module
