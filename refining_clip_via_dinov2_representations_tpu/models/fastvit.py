"""Native FastViT / MCi vision towers (MobileCLIP image encoders).

Closes the last timm-tower gap: the reference builds its MobileCLIP image
sides by wrapping timm (`src/open_clip/timm_model.py:60-67` with
`timm_proj=null`, so the *trunk classifier head* is the projection —
``num_classes=embed_dim``):

* ``fastvit_mci1`` / ``fastvit_mci2`` (MobileCLIP-S1/S2): FastViT hybrid
  stage stack — reparameterizable MobileOne conv stem (/4), three RepMixer
  stages with large-kernel reparam downsampling, one self-attention stage
  with a reparam conditional position encoding, a depthwise 2x expansion
  ``final_conv``, global average pool, and a linear head to ``embed_dim``.
* ``vit_base_mci_224`` (MobileCLIP-B): ViT-B/16 whose patchify is a 3-conv
  MCi stem (4/2/2 strides -> /16), ``no_embed_class`` position embedding
  (patch tokens only, class token appended un-embedded), token pooling,
  linear head to ``embed_dim``.

This is the *train-time* multi-branch (un-reparameterized) form — the form
Apple's published checkpoints use (`src/open_clip/convert.py:199-205`
detects ``rbr_conv``/``patch_emb`` train-layout keys) and the form needed
for fine-tuning. Branch fusion is a deploy-time optimization mobile
inference needs and a TPU does not: XLA already folds the 1x1/identity/BN
branches into a handful of fused convolutions. NHWC layout throughout; BN
statistics live in the ``batch_stats`` collection like `resnet.py`.

ORACLE STATUS: structurally tested only (shapes, reparam identity, branch
wiring) — timm is not installed in this environment and no MobileCLIP
checkpoint is available, so converter key names follow timm
``fastvit.py`` / ``vision_transformer_hybrid.py`` layouts from
documentation. Value-verify on first real checkpoint load; SE reduction
ratios (1/16 in MobileOne blocks, 1/4 in downsample large-kernel convs)
are the flagged uncertainty.

Reference parity targets: `src/open_clip/timm_model.py:23-198`,
`src/open_clip/convert.py:158-205`, model configs `MobileCLIP-{S1,S2,B}`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import LayerNorm, gelu

Dtype = Any


@dataclasses.dataclass(frozen=True)
class FastVitCfg:
    layers: Tuple[int, ...] = (4, 12, 20, 4)
    embed_dims: Tuple[int, ...] = (64, 128, 256, 512)
    mlp_ratios: Tuple[int, ...] = (3, 3, 3, 3)
    # which stage downsamplers carry Squeeze-Excite (MCi variants: last two)
    se_downsamples: Tuple[bool, ...] = (False, False, True, True)
    token_mixers: Tuple[str, ...] = ("repmixer", "repmixer", "repmixer", "attention")
    # RepCPE (reparam conditional pos-enc) ahead of the attention stage
    pos_emb_stages: Tuple[bool, ...] = (False, False, False, True)
    cls_ratio: float = 2.0
    image_size: int = 256
    lkc_use_act: bool = True  # GELU after the large-kernel downsample conv


# timm name -> cfg (timm fastvit.py mci entrypoints; MobileCLIP S0/S1/S2)
FASTVIT_DIMS: Dict[str, FastVitCfg] = {
    "fastvit_mci0": FastVitCfg(layers=(2, 6, 10, 2)),
    "fastvit_mci1": FastVitCfg(layers=(4, 12, 20, 4)),
    "fastvit_mci2": FastVitCfg(
        layers=(4, 12, 24, 4), embed_dims=(80, 160, 320, 640)
    ),
}


class SqueezeExcite(nn.Module):
    """Global-pool -> 1x1 reduce -> ReLU -> 1x1 expand -> sigmoid gate."""

    rd_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        chs = x.shape[-1]
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.rd_channels, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(chs, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class MobileOneBlock(nn.Module):
    """Multi-branch reparameterizable conv block (MobileOne / FastViT).

    Train-time branches summed: per-branch [kxk conv + BN], an optional
    [1x1 conv + BN] scale branch (kernel > 1), and a BN identity branch
    (shape-preserving only); then optional SE and activation. All branches
    fuse into one conv at deploy time — `test_fastvit.py` checks that
    identity numerically.
    """

    out_chs: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    use_se: bool = False
    use_act: bool = True
    use_scale_branch: bool = True
    num_conv_branches: int = 1
    inference_mode: bool = False  # single fused conv (see fuse_fastvit_variables)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        in_chs = x.shape[-1]
        bn = lambda name: nn.BatchNorm(
            use_running_average=deterministic, dtype=self.dtype, name=name
        )

        def branch(k: int, name: str) -> jnp.ndarray:
            pad = k // 2
            h = nn.Conv(
                self.out_chs, (k, k), strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)), feature_group_count=self.groups,
                use_bias=False, dtype=self.dtype, name=f"{name}_conv",
            )(x)
            return bn(f"{name}_bn")(h)

        if self.inference_mode:
            pad = self.kernel_size // 2
            out = nn.Conv(
                self.out_chs, (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)), feature_group_count=self.groups,
                use_bias=True, dtype=self.dtype, name="reparam_conv",
            )(x)
            if self.use_se:
                out = SqueezeExcite(
                    max(1, self.out_chs // 16), dtype=self.dtype, name="se"
                )(out)
            return gelu(out) if self.use_act else out

        out = None
        if in_chs == self.out_chs and self.stride == 1:
            out = bn("identity")(x)
        if self.use_scale_branch and self.kernel_size > 1:
            s = branch(1, "conv_scale")
            out = s if out is None else out + s
        for i in range(self.num_conv_branches):
            c = branch(self.kernel_size, f"conv_kxk_{i}")
            out = c if out is None else out + c
        assert out is not None, "MobileOneBlock with no branches"
        if self.use_se:
            out = SqueezeExcite(
                max(1, self.out_chs // 16), dtype=self.dtype, name="se"
            )(out)
        return gelu(out) if self.use_act else out


class ReparamLargeKernelConv(nn.Module):
    """Depthwise large-kernel (7x7/2) + small-kernel (3x3/2) reparam pair
    used as the FastViT stage downsampler, with optional SE (MCi late
    stages) and optional activation (``lkc_use_act``)."""

    out_chs: int
    kernel_size: int = 7
    stride: int = 2
    small_kernel: int = 3
    use_se: bool = False
    use_act: bool = True
    inference_mode: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        in_chs = x.shape[-1]
        bn = lambda name: nn.BatchNorm(
            use_running_average=deterministic, dtype=self.dtype, name=name
        )

        def branch(k: int, name: str) -> jnp.ndarray:
            pad = k // 2
            h = nn.Conv(
                self.out_chs, (k, k), strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)), feature_group_count=in_chs,
                use_bias=False, dtype=self.dtype, name=f"{name}_conv",
            )(x)
            return bn(f"{name}_bn")(h)

        if self.inference_mode:
            pad = self.kernel_size // 2
            out = nn.Conv(
                self.out_chs, (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)), feature_group_count=in_chs,
                use_bias=True, dtype=self.dtype, name="reparam_conv",
            )(x)
        else:
            out = branch(self.kernel_size, "large_conv") + branch(
                self.small_kernel, "small_conv"
            )
        if self.use_se:
            out = SqueezeExcite(
                max(1, self.out_chs // 4), dtype=self.dtype, name="se"
            )(out)
        return gelu(out) if self.use_act else out


class PatchEmbed(nn.Module):
    """Stage downsampler: ReparamLargeKernelConv (/2) + 1x1 MobileOne."""

    out_chs: int
    use_se: bool = False
    lkc_use_act: bool = True
    inference_mode: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = ReparamLargeKernelConv(
            out_chs=self.out_chs, use_se=self.use_se, use_act=self.lkc_use_act,
            inference_mode=self.inference_mode, dtype=self.dtype, name="proj_0",
        )(x, deterministic)
        return MobileOneBlock(
            out_chs=self.out_chs, kernel_size=1,
            inference_mode=self.inference_mode, dtype=self.dtype, name="proj_1"
        )(x, deterministic)


class RepMixer(nn.Module):
    """Token mixer: x + gamma * (dwconv_block(x) - bn(x)); both operands are
    reparameterizable MobileOne forms (the ``norm`` side is the bare
    identity-BN branch). Inference mode: one depthwise conv — identity,
    layer scale and both branches fold into its kernel/bias."""

    ls_init_value: float = 1e-5
    inference_mode: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        dim = x.shape[-1]
        if self.inference_mode:
            return nn.Conv(
                dim, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=dim,
                use_bias=True, dtype=self.dtype, name="reparam_conv",
            )(x)
        normed = MobileOneBlock(
            out_chs=dim, kernel_size=3, groups=dim, use_act=False,
            use_scale_branch=False, num_conv_branches=0, dtype=self.dtype,
            name="norm",
        )(x, deterministic)
        mixed = MobileOneBlock(
            out_chs=dim, kernel_size=3, groups=dim, use_act=False,
            dtype=self.dtype, name="mixer",
        )(x, deterministic)
        gamma = self.param(
            "layer_scale", nn.initializers.constant(self.ls_init_value),
            (dim,), jnp.float32,
        )
        return x + gamma.astype(x.dtype) * (mixed - normed)


class ConvMlp(nn.Module):
    """7x7 depthwise conv + BN, then 1x1 expand -> GELU -> 1x1 project.
    Inference mode folds the BN into the depthwise conv's bias/weights."""

    hidden_chs: int
    inference_mode: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        chs = x.shape[-1]
        h = nn.Conv(
            chs, (7, 7), padding=((3, 3), (3, 3)), feature_group_count=chs,
            use_bias=self.inference_mode, dtype=self.dtype, name="conv",
        )(x)
        if not self.inference_mode:
            h = nn.BatchNorm(
                use_running_average=deterministic, dtype=self.dtype, name="conv_bn"
            )(h)
        h = nn.Conv(self.hidden_chs, (1, 1), dtype=self.dtype, name="fc1")(h)
        h = gelu(h)
        return nn.Conv(chs, (1, 1), dtype=self.dtype, name="fc2")(h)


class RepMixerBlock(nn.Module):
    mlp_ratio: int = 3
    ls_init_value: float = 1e-5
    inference_mode: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        dim = x.shape[-1]
        x = RepMixer(
            inference_mode=self.inference_mode, dtype=self.dtype,
            name="token_mixer",
        )(x, deterministic)
        gamma = self.param(
            "layer_scale", nn.initializers.constant(self.ls_init_value),
            (dim,), jnp.float32,
        )
        h = ConvMlp(
            self.mlp_ratio * dim, inference_mode=self.inference_mode,
            dtype=self.dtype, name="mlp",
        )(x, deterministic)
        return x + gamma.astype(x.dtype) * h


class SpatialAttention(nn.Module):
    """MHSA over the flattened feature map (head_dim 32, no qkv bias)."""

    head_dim: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        heads = c // self.head_dim
        t = x.reshape(b, h * w, c)
        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype, name="qkv")(t)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(a):
            return a.reshape(b, h * w, heads, self.head_dim).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(self.head_dim)
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return out.reshape(b, h, w, c)


class _AffineChannel(nn.Module):
    """Per-channel scale+bias — an eval-mode BatchNorm after folding."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        chs = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (chs,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (chs,), jnp.float32)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class AttentionBlock(nn.Module):
    """BN -> MHSA (layer-scaled residual) -> ConvMlp (layer-scaled residual).
    Inference mode: the BN becomes a folded per-channel affine."""

    mlp_ratio: int = 3
    ls_init_value: float = 1e-5
    inference_mode: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        dim = x.shape[-1]
        ls = lambda name: self.param(
            name, nn.initializers.constant(self.ls_init_value), (dim,), jnp.float32
        )
        if self.inference_mode:
            h = _AffineChannel(dtype=self.dtype, name="norm")(x)
        else:
            h = nn.BatchNorm(
                use_running_average=deterministic, dtype=self.dtype, name="norm"
            )(x)
        h = SpatialAttention(dtype=self.dtype, name="token_mixer")(h)
        x = x + ls("layer_scale_1").astype(x.dtype) * h
        h = ConvMlp(
            self.mlp_ratio * dim, inference_mode=self.inference_mode,
            dtype=self.dtype, name="mlp",
        )(x, deterministic)
        return x + ls("layer_scale_2").astype(x.dtype) * h


class RepCPE(nn.Module):
    """Reparam conditional position encoding: x + dwconv7x7(x). Inference
    mode folds the identity into the kernel center (single conv, no add)."""

    inference_mode: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        chs = x.shape[-1]
        pe = nn.Conv(
            chs, (7, 7), padding=((3, 3), (3, 3)), feature_group_count=chs,
            use_bias=True, dtype=self.dtype, name="pos_enc",
        )(x)
        return pe if self.inference_mode else x + pe


class FastVitTower(nn.Module):
    """FastViT trunk + avg pool + linear head to ``output_dim``.

    Mirrors the reference `timm_model.py` construction for the MobileCLIP
    S-variants (``pool='avg'``, ``proj=null`` => trunk ``num_classes`` head
    is the projection)."""

    cfg: FastVitCfg = FastVitCfg()
    output_dim: int = 512
    output_tokens: bool = False
    inference_mode: bool = False  # reparameterized single-branch form
    dtype: Dtype = jnp.float32
    remat: bool = False
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, deterministic: bool = True):
        from .transformer import _remat

        c = self.cfg
        inf = self.inference_mode
        if pixel_values.shape[1] == 3 and pixel_values.shape[-1] != 3:
            pixel_values = jnp.transpose(pixel_values, (0, 2, 3, 1))
        x = pixel_values.astype(self.dtype)

        e0 = c.embed_dims[0]
        x = MobileOneBlock(out_chs=e0, kernel_size=3, stride=2, inference_mode=inf,
                           dtype=self.dtype, name="stem_0")(x, deterministic)
        x = MobileOneBlock(out_chs=e0, kernel_size=3, stride=2, groups=e0,
                           inference_mode=inf,
                           dtype=self.dtype, name="stem_1")(x, deterministic)
        x = MobileOneBlock(out_chs=e0, kernel_size=1, inference_mode=inf,
                           dtype=self.dtype, name="stem_2")(x, deterministic)

        # static_argnums=(2,): the python-bool `deterministic` arg (self=0)
        rep_cls = (
            _remat(RepMixerBlock, self.remat_policy, static_argnums=(2,))
            if self.remat else RepMixerBlock
        )
        attn_cls = (
            _remat(AttentionBlock, self.remat_policy, static_argnums=(2,))
            if self.remat else AttentionBlock
        )
        for s, (depth, dim) in enumerate(zip(c.layers, c.embed_dims)):
            if s > 0:
                x = PatchEmbed(
                    out_chs=dim, use_se=c.se_downsamples[s],
                    lkc_use_act=c.lkc_use_act, inference_mode=inf,
                    dtype=self.dtype,
                    name=f"stage{s}_downsample",
                )(x, deterministic)
            if c.pos_emb_stages[s]:
                x = RepCPE(inference_mode=inf, dtype=self.dtype,
                           name=f"stage{s}_pos_emb")(x)
            for b in range(depth):
                if c.token_mixers[s] == "attention":
                    x = attn_cls(
                        mlp_ratio=c.mlp_ratios[s], inference_mode=inf,
                        dtype=self.dtype,
                        name=f"stage{s}_block{b}",
                    )(x, deterministic)
                else:
                    x = rep_cls(
                        mlp_ratio=c.mlp_ratios[s], inference_mode=inf,
                        dtype=self.dtype,
                        name=f"stage{s}_block{b}",
                    )(x, deterministic)

        final_chs = int(c.embed_dims[-1] * c.cls_ratio)
        x = MobileOneBlock(
            out_chs=final_chs, kernel_size=3, groups=c.embed_dims[-1],
            use_se=True, inference_mode=inf, dtype=self.dtype, name="final_conv",
        )(x, deterministic)

        tokens = x.reshape(x.shape[0], -1, x.shape[-1])
        pooled = x.mean(axis=(1, 2))
        pooled = nn.Dense(self.output_dim, dtype=self.dtype, name="head_fc")(pooled)
        if self.output_tokens:
            return pooled, tokens
        return pooled


class MciVisionTransformer(nn.Module):
    """``vit_base_mci_224``: ViT-B/16 with a 3-conv MCi stem (MobileCLIP-B).

    Stem: conv(3->w/4, 4x4/4) -> BN -> GELU, conv(w/4->w/4, 2x2/2) -> BN ->
    GELU, conv(w/4->w, 2x2/2) -> BN -> GELU (total /16). ``no_embed_class``
    position embedding over patch tokens only; class token appended; 12
    pre-norm transformer blocks; final LN; token pool; linear head."""

    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    image_size: int = 224
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    remat_policy: str = "full"
    output_tokens: bool = False

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, deterministic: bool = True):
        from .transformer import ResidualAttentionBlock, _remat

        if pixel_values.shape[1] == 3 and pixel_values.shape[-1] != 3:
            pixel_values = jnp.transpose(pixel_values, (0, 2, 3, 1))
        x = pixel_values.astype(self.dtype)

        mid = self.width // 4
        for i, (chs, k, s) in enumerate(
            [(mid, 4, 4), (mid, 2, 2), (self.width, 2, 2)]
        ):
            x = nn.Conv(
                chs, (k, k), strides=(s, s), padding="VALID", use_bias=False,
                dtype=self.dtype, name=f"stem_{i}_conv",
            )(x)
            x = nn.BatchNorm(
                use_running_average=deterministic, dtype=self.dtype,
                name=f"stem_{i}_bn",
            )(x)
            x = gelu(x)

        b, gh, gw, w = x.shape
        tokens = x.reshape(b, gh * gw, w)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(stddev=0.02),
            (gh * gw, w), jnp.float32,
        )
        # no_embed_class: pos added to patch tokens, cls appended un-embedded
        tokens = tokens + pos.astype(tokens.dtype)
        cls = self.param(
            "class_embedding", nn.initializers.normal(stddev=0.02),
            (w,), jnp.float32,
        )
        cls_tok = jnp.broadcast_to(cls.astype(tokens.dtype), (b, 1, w))
        tokens = jnp.concatenate([cls_tok, tokens], axis=1)

        block_cls = (
            _remat(ResidualAttentionBlock, self.remat_policy, static_argnums=(4,))
            if self.remat else ResidualAttentionBlock
        )
        for i in range(self.layers):
            tokens = block_cls(
                n_head=self.heads, norm_eps=self.norm_eps, dtype=self.dtype,
                attn_impl=self.attn_impl, name=f"resblocks_{i}",
            )(tokens, None, None, False)
        tokens = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")(
            tokens
        )
        pooled = tokens[:, 0]
        pooled = nn.Dense(self.output_dim, dtype=self.dtype, name="head_fc")(pooled)
        if self.output_tokens:
            return pooled, tokens[:, 1:]
        return pooled


# ---------------------------------------------------------------------------
# Checkpoint conversion (timm layout -> this tower). Mirrors
# `src/open_clip/convert.py:158-197`: Apple checkpoints are first mapped to
# the timm layout by timm's checkpoint_filter_fn; these functions take it
# from the timm layout (the layout open_clip hub checkpoints ship in).
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_w(t) -> np.ndarray:
    return _np(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _set(tree: Dict[str, Any], path, val) -> None:
    cur = tree
    for p in path[:-1]:
        cur = cur.setdefault(p, {})
    cur[path[-1]] = val


_BN_MAP = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def _convert_convbn(params, stats, prefix_path, key_rest, tensor) -> bool:
    """Map timm ConvNormAct ``{conv.weight, bn.*}`` leaves onto our flat
    ``<name>_conv`` / ``<name>_bn`` module names."""
    head, name = prefix_path[:-1], prefix_path[-1]
    if key_rest == ["conv", "weight"]:
        _set(params, head + [name + "_conv", "kernel"], _conv_w(tensor))
        return True
    if len(key_rest) == 2 and key_rest[0] == "bn" and key_rest[1] in _BN_MAP:
        coll, leaf = _BN_MAP[key_rest[1]]
        tgt = params if coll == "params" else stats
        _set(tgt, head + [name + "_bn", leaf], _np(tensor))
        return True
    return False


def _mobileone_dest(parts):
    """timm MobileOneBlock sub-key -> (our suffix path, kind)."""
    # parts like: identity.weight | conv_scale.conv.weight |
    #             conv_kxk.0.bn.running_mean | se.fc1.weight
    if parts[0] == "identity":
        return (["identity"], "bn", parts[1:])
    if parts[0] == "conv_scale":
        return (["conv_scale"], "convbn", parts[1:])
    if parts[0] == "conv_kxk":
        return ([f"conv_kxk_{parts[1]}"], "convbn", parts[2:])
    if parts[0] == "se":
        return (["se", parts[1]], "convb", parts[2:])
    return None


def _apply_mobileone(params, stats, base, parts, tensor) -> bool:
    dest = _mobileone_dest(parts)
    if dest is None:
        return False
    sub, kind, rest = dest
    if kind == "bn":
        if rest[0] in _BN_MAP:
            coll, leaf = _BN_MAP[rest[0]]
            tgt = params if coll == "params" else stats
            _set(tgt, base + sub + [leaf], _np(tensor))
            return True
        return False
    if kind == "convbn":
        if rest == ["conv", "weight"]:
            _set(params, base + [sub[0] + "_conv", "kernel"], _conv_w(tensor))
            return True
        if len(rest) == 2 and rest[0] == "bn" and rest[1] in _BN_MAP:
            coll, leaf = _BN_MAP[rest[1]]
            tgt = params if coll == "params" else stats
            _set(tgt, base + [sub[0] + "_bn", leaf], _np(tensor))
            return True
        return False
    if kind == "convb":  # se.fc{1,2}.{weight,bias}
        if rest == ["weight"]:
            _set(params, base + sub + ["kernel"], _conv_w(tensor))
            return True
        if rest == ["bias"]:
            _set(params, base + sub + ["bias"], _np(tensor))
            return True
    return False


def convert_timm_fastvit_state_dict(
    state_dict: Mapping[str, Any], trunk_prefix: str = "visual.trunk."
) -> Dict[str, Any]:
    """timm ``fastvit_mci*`` state-dict (open_clip hub layout,
    ``visual.trunk.*`` incl. the num_classes head) -> FastVitTower
    variables ``{'params': ..., 'batch_stats': ...}`` for the ``visual``
    submodule."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    unmatched = []
    for key, tensor in state_dict.items():
        if not key.startswith(trunk_prefix):
            continue
        k = key[len(trunk_prefix):]
        parts = k.split(".")
        ok = False
        if parts[0] == "stem":
            ok = _apply_mobileone(params, stats, [f"stem_{parts[1]}"], parts[2:], tensor)
        elif parts[0] == "final_conv":
            ok = _apply_mobileone(params, stats, ["final_conv"], parts[1:], tensor)
        elif parts[0] == "head":
            if parts[1] == "fc" and parts[2] == "weight":
                _set(params, ["head_fc", "kernel"], _np(tensor).T)
                ok = True
            elif parts[1] == "fc" and parts[2] == "bias":
                _set(params, ["head_fc", "bias"], _np(tensor))
                ok = True
        elif parts[0] == "stages":
            s = int(parts[1])
            rest = parts[2:]
            if rest[0] == "downsample":
                # downsample.proj.0.* (RLKC) | downsample.proj.1.* (MobileOne)
                base = [f"stage{s}_downsample"]
                if rest[1] == "proj" and rest[2] == "0":
                    r = rest[3:]
                    if r[0] in ("large_conv", "small_conv"):
                        ok = _convert_convbn(
                            params, stats, base + ["proj_0", r[0]], r[1:], tensor
                        )
                    elif r[0] == "se":
                        ok = _apply_mobileone(
                            params, stats, base + ["proj_0"], r, tensor
                        )
                elif rest[1] == "proj" and rest[2] == "1":
                    ok = _apply_mobileone(
                        params, stats, base + ["proj_1"], rest[3:], tensor
                    )
            elif rest[0] == "pos_emb":
                if rest[1] == "pos_enc" and rest[2] == "weight":
                    _set(params, [f"stage{s}_pos_emb", "pos_enc", "kernel"],
                         _conv_w(tensor))
                    ok = True
                elif rest[1] == "pos_enc" and rest[2] == "bias":
                    _set(params, [f"stage{s}_pos_emb", "pos_enc", "bias"],
                         _np(tensor))
                    ok = True
            elif rest[0] == "blocks":
                b = int(rest[1])
                base = [f"stage{s}_block{b}"]
                r = rest[2:]
                if r[0] == "token_mixer":
                    if r[1] in ("norm", "mixer"):
                        ok = _apply_mobileone(
                            params, stats, base + ["token_mixer", r[1]], r[2:],
                            tensor,
                        )
                    elif r[1] == "layer_scale":
                        _set(params, base + ["token_mixer", "layer_scale"],
                             _np(tensor).reshape(-1))
                        ok = True
                    elif r[1] in ("qkv", "proj"):
                        leaf = ("kernel" if r[2] == "weight" else "bias")
                        val = _np(tensor).T if r[2] == "weight" else _np(tensor)
                        _set(params, base + ["token_mixer", r[1], leaf], val)
                        ok = True
                elif r[0] == "norm":  # attention block BN
                    if r[1] in _BN_MAP:
                        coll, leaf = _BN_MAP[r[1]]
                        tgt = params if coll == "params" else stats
                        _set(tgt, base + ["norm", leaf], _np(tensor))
                        ok = True
                elif r[0] == "mlp":
                    if r[1] == "conv":
                        # timm: mlp.conv.conv.weight / mlp.conv.bn.* ->
                        # ours: mlp/conv/kernel + mlp/conv_bn/*
                        rr = r[2:]
                        if rr == ["conv", "weight"]:
                            _set(params, base + ["mlp", "conv", "kernel"],
                                 _conv_w(tensor))
                            ok = True
                        elif len(rr) == 2 and rr[0] == "bn" and rr[1] in _BN_MAP:
                            coll, leaf = _BN_MAP[rr[1]]
                            tgt = params if coll == "params" else stats
                            _set(tgt, base + ["mlp", "conv_bn", leaf], _np(tensor))
                            ok = True
                    elif r[1] in ("fc1", "fc2"):
                        if r[2] == "weight":
                            _set(params, base + ["mlp", r[1], "kernel"],
                                 _conv_w(tensor))
                            ok = True
                        elif r[2] == "bias":
                            _set(params, base + ["mlp", r[1], "bias"], _np(tensor))
                            ok = True
                elif r[0].startswith("layer_scale"):
                    name = r[0] if r[0] != "layer_scale" else "layer_scale"
                    _set(params, base + [name], _np(tensor).reshape(-1))
                    ok = True
        if not ok:
            unmatched.append(key)
    if unmatched:
        raise ValueError(
            f"unrecognized fastvit keys (first 10): {unmatched[:10]}"
        )
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Deploy-time structural reparameterization: fold every multi-branch
# MobileOne/RepMixer/RLKC subtree into a single conv (the transformation the
# FastViT paper performs at inference; `timm_model.py`-wrapped towers get it
# from timm's reparameterize_model). Produces variables for
# `FastVitTower(inference_mode=True)` — ~2x fewer convs in RepMixer stages
# and no BatchNorm state. Numerics verified in
# tests/test_fastvit.py::test_full_tower_reparameterization.
# ---------------------------------------------------------------------------

_BN_EPS = 1e-5  # flax nn.BatchNorm default, matches torch


def _fold_bn(kernel: np.ndarray, bn_p, bn_s) -> Tuple[np.ndarray, np.ndarray]:
    scale = np.asarray(bn_p["scale"]) / np.sqrt(np.asarray(bn_s["var"]) + _BN_EPS)
    w = np.asarray(kernel) * scale[None, None, None, :]
    b = np.asarray(bn_p["bias"]) - np.asarray(bn_s["mean"]) * scale
    return w, b


def _pad_center(kernel: np.ndarray, k: int) -> np.ndarray:
    kh = kernel.shape[0]
    if kh == k:
        return kernel
    off = (k - kh) // 2
    out = np.zeros((k, k) + kernel.shape[2:], kernel.dtype)
    out[off:off + kh, off:off + kh] = kernel
    return out


def _identity_kernel(k: int, in_pg: int, out_chs: int) -> np.ndarray:
    """HWIO identity kernel for a grouped conv with out == in channels."""
    w = np.zeros((k, k, in_pg, out_chs), np.float32)
    for o in range(out_chs):
        w[k // 2, k // 2, o % in_pg, o] = 1.0
    return w


def _fuse_mobileone(p: Mapping[str, Any], s: Mapping[str, Any]) -> Dict[str, Any]:
    kxk = sorted(n for n in p if n.startswith("conv_kxk_") and n.endswith("_conv"))
    assert kxk, "not a MobileOneBlock subtree"
    ref = np.asarray(p[kxk[0]]["kernel"])
    k, in_pg, out_chs = ref.shape[0], ref.shape[2], ref.shape[3]
    w = np.zeros_like(ref, dtype=np.float32)
    b = np.zeros((out_chs,), np.float32)
    for name in kxk:
        bn = name[:-5] + "_bn"
        wi, bi = _fold_bn(p[name]["kernel"], p[bn], s[bn])
        w, b = w + wi, b + bi
    if "conv_scale_conv" in p:
        wi, bi = _fold_bn(p["conv_scale_conv"]["kernel"], p["conv_scale_bn"],
                          s["conv_scale_bn"])
        w, b = w + _pad_center(wi, k), b + bi
    if "identity" in p:
        scale = np.asarray(p["identity"]["scale"]) / np.sqrt(
            np.asarray(s["identity"]["var"]) + _BN_EPS)
        w = w + _identity_kernel(k, in_pg, out_chs) * scale[None, None, None, :]
        b = b + np.asarray(p["identity"]["bias"]) - np.asarray(
            s["identity"]["mean"]) * scale
    out = {"reparam_conv": {"kernel": w, "bias": b}}
    if "se" in p:
        out["se"] = p["se"]
    return out


def _fuse_rlkc(p: Mapping[str, Any], s: Mapping[str, Any]) -> Dict[str, Any]:
    w, b = _fold_bn(p["large_conv_conv"]["kernel"], p["large_conv_bn"],
                    s["large_conv_bn"])
    ws, bs = _fold_bn(p["small_conv_conv"]["kernel"], p["small_conv_bn"],
                      s["small_conv_bn"])
    out = {"reparam_conv": {"kernel": w + _pad_center(ws, w.shape[0]),
                            "bias": b + bs}}
    if "se" in p:
        out["se"] = p["se"]
    return out


def _fuse_repmixer(p: Mapping[str, Any], s: Mapping[str, Any]) -> Dict[str, Any]:
    """x + gamma*(mixer(x) - bn(x))  ->  one depthwise conv."""
    mix = _fuse_mobileone(p["mixer"], s["mixer"])["reparam_conv"]
    wm, bm = mix["kernel"], mix["bias"]
    k, in_pg, out_chs = wm.shape[0], wm.shape[2], wm.shape[3]
    scale = np.asarray(p["norm"]["identity"]["scale"]) / np.sqrt(
        np.asarray(s["norm"]["identity"]["var"]) + _BN_EPS)
    wn = _identity_kernel(k, in_pg, out_chs) * scale[None, None, None, :]
    bn = np.asarray(p["norm"]["identity"]["bias"]) - np.asarray(
        s["norm"]["identity"]["mean"]) * scale
    gamma = np.asarray(p["layer_scale"], np.float32)
    w = _identity_kernel(k, in_pg, out_chs) + gamma[None, None, None, :] * (wm - wn)
    b = gamma * (bm - bn)
    return {"reparam_conv": {"kernel": w, "bias": b}}


def _fuse_convmlp(p: Mapping[str, Any], s: Mapping[str, Any]) -> Dict[str, Any]:
    w, b = _fold_bn(p["conv"]["kernel"], p["conv_bn"], s["conv_bn"])
    return {"conv": {"kernel": w, "bias": b}, "fc1": p["fc1"], "fc2": p["fc2"]}


def fuse_fastvit_variables(variables: Mapping[str, Any]) -> Dict[str, Any]:
    """Train-time FastVitTower variables -> variables for the same tower
    with ``inference_mode=True`` (single-branch reparameterized form)."""
    p = variables["params"]
    s = variables.get("batch_stats", {})
    out: Dict[str, Any] = {}
    for name, sub in p.items():
        ss = s.get(name, {})
        if name == "head_fc":
            out[name] = sub
        elif name.endswith("_pos_emb"):
            w = np.asarray(sub["pos_enc"]["kernel"], np.float32).copy()
            k, in_pg, out_chs = w.shape[0], w.shape[2], w.shape[3]
            w += _identity_kernel(k, in_pg, out_chs)
            out[name] = {"pos_enc": {"kernel": w, "bias": sub["pos_enc"]["bias"]}}
        elif name.endswith("_downsample"):
            out[name] = {
                "proj_0": _fuse_rlkc(sub["proj_0"], ss["proj_0"]),
                "proj_1": _fuse_mobileone(sub["proj_1"], ss["proj_1"]),
            }
        elif "token_mixer" in sub and "qkv" in sub["token_mixer"]:
            # attention block: BN -> affine, mlp BN folded
            scale = np.asarray(sub["norm"]["scale"]) / np.sqrt(
                np.asarray(ss["norm"]["var"]) + _BN_EPS)
            bias = np.asarray(sub["norm"]["bias"]) - np.asarray(
                ss["norm"]["mean"]) * scale
            out[name] = {
                "norm": {"scale": scale, "bias": bias},
                "token_mixer": sub["token_mixer"],
                "layer_scale_1": sub["layer_scale_1"],
                "layer_scale_2": sub["layer_scale_2"],
                "mlp": _fuse_convmlp(sub["mlp"], ss["mlp"]),
            }
        elif "token_mixer" in sub:
            out[name] = {
                "token_mixer": _fuse_repmixer(sub["token_mixer"],
                                              ss["token_mixer"]),
                "layer_scale": sub["layer_scale"],
                "mlp": _fuse_convmlp(sub["mlp"], ss["mlp"]),
            }
        else:  # stem_*, final_conv
            out[name] = _fuse_mobileone(sub, ss)
    return {"params": out}


def convert_timm_mci_vit_state_dict(
    state_dict: Mapping[str, Any], trunk_prefix: str = "visual.trunk."
) -> Dict[str, Any]:
    """timm ``vit_base_mci_224`` (hybrid ViT) state-dict -> MciVisionTransformer
    variables for the ``visual`` submodule."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    unmatched = []
    for key, tensor in state_dict.items():
        if not key.startswith(trunk_prefix):
            continue
        k = key[len(trunk_prefix):]
        parts = k.split(".")
        ok = False
        if parts[0] == "patch_embed" and parts[1] == "backbone":
            i = parts[2]
            if parts[3] == "conv" and parts[4] == "weight":
                _set(params, [f"stem_{i}_conv", "kernel"], _conv_w(tensor))
                ok = True
            elif parts[3] == "bn" and parts[4] in _BN_MAP:
                coll, leaf = _BN_MAP[parts[4]]
                tgt = params if coll == "params" else stats
                _set(tgt, [f"stem_{i}_bn", leaf], _np(tensor))
                ok = True
        elif parts[0] == "cls_token":
            _set(params, ["class_embedding"], _np(tensor).reshape(-1))
            ok = True
        elif parts[0] == "pos_embed":
            _set(params, ["positional_embedding"], _np(tensor).reshape(
                -1, _np(tensor).shape[-1]))
            ok = True
        elif parts[0] == "norm":
            _set(params, ["norm", "scale" if parts[1] == "weight" else "bias"],
                 _np(tensor))
            ok = True
        elif parts[0] == "head":
            leaf = "kernel" if parts[1] == "weight" else "bias"
            val = _np(tensor).T if parts[1] == "weight" else _np(tensor)
            _set(params, ["head_fc", leaf], val)
            ok = True
        elif parts[0] == "blocks":
            b = parts[1]
            base = [f"resblocks_{b}"]
            r = parts[2:]
            t = _np(tensor)
            if r[0] == "norm1":
                _set(params, base + ["ln_1", "scale" if r[1] == "weight" else "bias"], t)
                ok = True
            elif r[0] == "norm2":
                _set(params, base + ["ln_2", "scale" if r[1] == "weight" else "bias"], t)
                ok = True
            elif r[0] == "attn" and r[1] == "qkv":
                if r[2] == "weight":
                    _set(params, base + ["attn", "in_proj_kernel"], t.T)
                else:
                    _set(params, base + ["attn", "in_proj_bias"], t)
                ok = True
            elif r[0] == "attn" and r[1] == "proj":
                if r[2] == "weight":
                    _set(params, base + ["attn", "out_proj", "kernel"], t.T)
                else:
                    _set(params, base + ["attn", "out_proj", "bias"], t)
                ok = True
            elif r[0] == "mlp" and r[1] in ("fc1", "fc2"):
                ours = "c_fc" if r[1] == "fc1" else "c_proj"
                if r[2] == "weight":
                    _set(params, base + ["mlp", ours, "kernel"], t.T)
                else:
                    _set(params, base + ["mlp", ours, "bias"], t)
                ok = True
        if not ok:
            unmatched.append(key)
    if unmatched:
        raise ValueError(f"unrecognized mci-vit keys (first 10): {unmatched[:10]}")
    out: Dict[str, Any] = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


# ---------------------------------------------------------------------------
# torch-interop export: inverse of convert_timm_fastvit_state_dict
# ---------------------------------------------------------------------------

def _conv_w_inv(k) -> np.ndarray:
    return np.asarray(k, np.float32).transpose(3, 2, 0, 1)  # HWIO -> OIHW


def _emit_bn_inv(sd, timm_base, p_bn, s_bn):
    sd[f"{timm_base}.weight"] = np.asarray(p_bn["scale"], np.float32)
    sd[f"{timm_base}.bias"] = np.asarray(p_bn["bias"], np.float32)
    sd[f"{timm_base}.running_mean"] = np.asarray(s_bn["mean"], np.float32)
    sd[f"{timm_base}.running_var"] = np.asarray(s_bn["var"], np.float32)


def _emit_mobileone_inv(sd, timm_base, p, s):
    """Emit a MobileOneBlock subtree (flax naming from `_mobileone_dest`)."""
    for name in p:
        if name == "identity":
            _emit_bn_inv(sd, f"{timm_base}.identity", p[name], s["identity"])
        elif name == "conv_scale_conv":
            sd[f"{timm_base}.conv_scale.conv.weight"] = _conv_w_inv(p[name]["kernel"])
        elif name == "conv_scale_bn":
            _emit_bn_inv(sd, f"{timm_base}.conv_scale.bn", p[name], s[name])
        elif name.startswith("conv_kxk_") and name.endswith("_conv"):
            j = name[len("conv_kxk_"):-len("_conv")]
            sd[f"{timm_base}.conv_kxk.{j}.conv.weight"] = _conv_w_inv(p[name]["kernel"])
        elif name.startswith("conv_kxk_") and name.endswith("_bn"):
            j = name[len("conv_kxk_"):-len("_bn")]
            _emit_bn_inv(sd, f"{timm_base}.conv_kxk.{j}.bn", p[name], s[name])
        elif name == "se":
            for fc in p[name]:
                sd[f"{timm_base}.se.{fc}.weight"] = _conv_w_inv(p[name][fc]["kernel"])
                sd[f"{timm_base}.se.{fc}.bias"] = np.asarray(p[name][fc]["bias"], np.float32)
        else:
            raise KeyError(f"unexported MobileOne leaf {timm_base}/{name}")


def fastvit_params_to_timm_state_dict(
    visual: Mapping[str, Any],
    batch_stats: Mapping[str, Any],
    trunk_prefix: str = "visual.trunk.",
) -> Dict[str, Any]:
    """Inverse of `convert_timm_fastvit_state_dict`: flax FastViT/MCi tower
    params + BN running stats → timm `fastvit_mci*` layout (roundtrips
    losslessly through the importer). Layer-scale gammas are restored to
    timm's [C, 1, 1] shape."""
    sd: Dict[str, Any] = {}
    t = trunk_prefix

    def gamma(v):
        return np.asarray(v, np.float32).reshape(-1, 1, 1)

    for name in visual:
        p = visual[name]
        s = batch_stats.get(name, {})
        if name.startswith("stem_"):
            _emit_mobileone_inv(sd, f"{t}stem.{name.split('_')[1]}", p, s)
        elif name == "final_conv":
            _emit_mobileone_inv(sd, f"{t}final_conv", p, s)
        elif name == "head_fc":
            sd[f"{t}head.fc.weight"] = np.asarray(p["kernel"], np.float32).T
            if "bias" in p:
                sd[f"{t}head.fc.bias"] = np.asarray(p["bias"], np.float32)
        elif name.endswith("_downsample"):
            stage = name[len("stage"):-len("_downsample")]
            d = f"{t}stages.{stage}.downsample.proj"
            p0, s0 = p["proj_0"], s.get("proj_0", {})
            for sub in p0:
                if sub.endswith("_conv"):
                    sd[f"{d}.0.{sub[:-len('_conv')]}.conv.weight"] = _conv_w_inv(
                        p0[sub]["kernel"]
                    )
                elif sub.endswith("_bn"):
                    _emit_bn_inv(sd, f"{d}.0.{sub[:-len('_bn')]}.bn", p0[sub], s0[sub])
                elif sub == "se":
                    for fc in p0[sub]:
                        sd[f"{d}.0.se.{fc}.weight"] = _conv_w_inv(p0[sub][fc]["kernel"])
                        sd[f"{d}.0.se.{fc}.bias"] = np.asarray(
                            p0[sub][fc]["bias"], np.float32
                        )
                else:
                    raise KeyError(f"unexported downsample leaf {name}/{sub}")
            _emit_mobileone_inv(sd, f"{d}.1", p["proj_1"], s.get("proj_1", {}))
        elif name.endswith("_pos_emb"):
            stage = name[len("stage"):-len("_pos_emb")]
            sd[f"{t}stages.{stage}.pos_emb.pos_enc.weight"] = _conv_w_inv(
                p["pos_enc"]["kernel"]
            )
            sd[f"{t}stages.{stage}.pos_emb.pos_enc.bias"] = np.asarray(
                p["pos_enc"]["bias"], np.float32
            )
        elif "_block" in name and name.startswith("stage"):
            stage, block = name[len("stage"):].split("_block")
            bp = f"{t}stages.{stage}.blocks.{block}"
            for sub in p:
                if sub == "token_mixer":
                    tm, tms = p[sub], s.get(sub, {})
                    for m in tm:
                        if m in ("norm", "mixer"):
                            _emit_mobileone_inv(
                                sd, f"{bp}.token_mixer.{m}", tm[m], tms.get(m, {})
                            )
                        elif m == "layer_scale":
                            sd[f"{bp}.token_mixer.layer_scale.gamma"] = gamma(tm[m])
                        elif m in ("qkv", "proj"):
                            sd[f"{bp}.token_mixer.{m}.weight"] = np.asarray(
                                tm[m]["kernel"], np.float32
                            ).T
                            if "bias" in tm[m]:
                                sd[f"{bp}.token_mixer.{m}.bias"] = np.asarray(
                                    tm[m]["bias"], np.float32
                                )
                        else:
                            raise KeyError(f"unexported token_mixer leaf {name}/{m}")
                elif sub == "norm":  # attention-block BN
                    _emit_bn_inv(sd, f"{bp}.norm", p[sub], s["norm"])
                elif sub == "mlp":
                    mlp, mlps = p[sub], s.get(sub, {})
                    sd[f"{bp}.mlp.conv.conv.weight"] = _conv_w_inv(mlp["conv"]["kernel"])
                    _emit_bn_inv(sd, f"{bp}.mlp.conv.bn", mlp["conv_bn"], mlps["conv_bn"])
                    for fc in ("fc1", "fc2"):
                        sd[f"{bp}.mlp.{fc}.weight"] = _conv_w_inv(mlp[fc]["kernel"])
                        sd[f"{bp}.mlp.{fc}.bias"] = np.asarray(
                            mlp[fc]["bias"], np.float32
                        )
                elif sub.startswith("layer_scale"):
                    sd[f"{bp}.{sub}.gamma"] = gamma(p[sub])
                else:
                    raise KeyError(f"unexported block leaf {name}/{sub}")
        else:
            raise KeyError(f"unexported fastvit tower entry {name}")
    return sd


def mci_vit_params_to_timm_state_dict(
    visual: Mapping[str, Any],
    batch_stats: Optional[Mapping[str, Any]] = None,
    trunk_prefix: str = "visual.trunk.",
) -> Dict[str, Any]:
    """Inverse of `convert_timm_mci_vit_state_dict` (vit_base_mci_224)."""
    sd: Dict[str, Any] = {}
    t = trunk_prefix
    stats = batch_stats or {}
    if any(n.endswith("_bn") for n in visual) and not stats:
        raise ValueError(
            "MCi-ViT torch export needs batch_stats (stem BN running statistics)"
        )

    def put(key, val):
        sd[t + key] = np.asarray(val, np.float32)

    for name in visual:
        p = visual[name]
        if name.endswith("_conv") and name.startswith("stem_"):
            i = name[len("stem_"):-len("_conv")]
            put(f"patch_embed.backbone.{i}.conv.weight", _conv_w_inv(p["kernel"]))
        elif name.endswith("_bn") and name.startswith("stem_"):
            i = name[len("stem_"):-len("_bn")]
            _emit_bn_inv(sd, f"{t}patch_embed.backbone.{i}.bn", p, stats[name])
        elif name == "class_embedding":
            put("cls_token", np.asarray(p).reshape(1, 1, -1))
        elif name == "positional_embedding":
            pe = np.asarray(p)
            put("pos_embed", pe.reshape(1, *pe.shape))
        elif name == "norm":
            put("norm.weight", p["scale"])
            put("norm.bias", p["bias"])
        elif name == "head_fc":
            put("head.weight", np.asarray(p["kernel"]).T)
            if "bias" in p:
                put("head.bias", p["bias"])
        elif name.startswith("resblocks_"):
            b = name.split("_")[-1]
            bp = f"blocks.{b}"
            put(f"{bp}.norm1.weight", p["ln_1"]["scale"])
            put(f"{bp}.norm1.bias", p["ln_1"]["bias"])
            put(f"{bp}.norm2.weight", p["ln_2"]["scale"])
            put(f"{bp}.norm2.bias", p["ln_2"]["bias"])
            put(f"{bp}.attn.qkv.weight", np.asarray(p["attn"]["in_proj_kernel"]).T)
            if "in_proj_bias" in p["attn"]:
                put(f"{bp}.attn.qkv.bias", p["attn"]["in_proj_bias"])
            put(f"{bp}.attn.proj.weight", np.asarray(p["attn"]["out_proj"]["kernel"]).T)
            if "bias" in p["attn"]["out_proj"]:
                put(f"{bp}.attn.proj.bias", p["attn"]["out_proj"]["bias"])
            put(f"{bp}.mlp.fc1.weight", np.asarray(p["mlp"]["c_fc"]["kernel"]).T)
            put(f"{bp}.mlp.fc1.bias", p["mlp"]["c_fc"]["bias"])
            put(f"{bp}.mlp.fc2.weight", np.asarray(p["mlp"]["c_proj"]["kernel"]).T)
            put(f"{bp}.mlp.fc2.bias", p["mlp"]["c_proj"]["bias"])
        else:
            raise KeyError(f"unexported mci-vit tower entry {name}")
    return sd
