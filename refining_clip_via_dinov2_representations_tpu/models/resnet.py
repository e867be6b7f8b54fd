"""ModifiedResNet vision tower (OpenAI RN50 family).

Flax rebuild of `src/open_clip/modified_resnet.py`: 3-conv stem with avgpool,
antialiased strides (avgpool before the strided conv's position), Bottleneck
x4 stages, and QKV attention pooling with a mean-token query
(`modified_resnet.py:59-93`). NHWC layout throughout.

BatchNorm uses flax `nn.BatchNorm`: running statistics live in the
`batch_stats` collection. Inference (`deterministic=True`, the default in
`CLIP.encode_image`) uses running averages; training updates them when the
caller passes `mutable=["batch_stats"]`.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import multi_head_attention

Dtype = Any


def _avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return nn.avg_pool(x, (k, k), strides=(k, k))


class Bottleneck(nn.Module):
    """(`modified_resnet.py:11-56`) — stride realized as post-conv2 avgpool."""

    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        inplanes = x.shape[-1]
        out_planes = self.planes * self.expansion
        bn = lambda name: nn.BatchNorm(
            use_running_average=deterministic, dtype=self.dtype, name=name
        )
        conv = lambda features, k, name: nn.Conv(
            features, (k, k), use_bias=False, padding="SAME" if k > 1 else "VALID",
            dtype=self.dtype, name=name,
        )

        identity = x
        out = nn.relu(bn("bn1")(conv(self.planes, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, "conv2")(out)))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = bn("bn3")(conv(out_planes, 1, "conv3")(out))

        if self.stride > 1 or inplanes != out_planes:
            identity = _avg_pool(x, self.stride) if self.stride > 1 else x
            identity = conv(out_planes, 1, "downsample_conv")(identity)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """QKV pooling with mean-token query (`modified_resnet.py:59-93`)."""

    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None
    spacial_dim: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = jnp.concatenate(
            [tokens.mean(axis=1, keepdims=True), tokens], axis=1
        )  # [B, HW+1, C]
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=self.embed_dim ** -0.5),
            (self.spacial_dim ** 2 + 1, self.embed_dim),
            jnp.float32,
        )
        tokens = tokens + pos.astype(tokens.dtype)

        # only the mean token is queried (reference `modified_resnet.py:88`
        # passes `query=x[:1]`) — projecting all HW+1 queries and keeping
        # row 0 would waste ~HW x the attention FLOPs for identical output
        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(tokens[:, :1])
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(tokens)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(tokens)

        head_dim = self.embed_dim // self.num_heads

        def heads(t):
            return t.reshape(b, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        out = multi_head_attention(heads(q), heads(k), heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, self.embed_dim)
        out = nn.Dense(
            self.output_dim or self.embed_dim, dtype=self.dtype, name="c_proj"
        )(out)
        return out[:, 0]  # the mean-token position


class ModifiedResNet(nn.Module):
    """(`modified_resnet.py:96-200`)"""

    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    output_dim: int = 1024
    heads: int = 32
    image_size: int = 224
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        if x.shape[1] == 3 and x.shape[-1] != 3:
            x = jnp.transpose(x, (0, 2, 3, 1))
        x = x.astype(self.dtype)

        bn = lambda name: nn.BatchNorm(
            use_running_average=deterministic, dtype=self.dtype, name=name
        )
        # 3-conv stem. conv1 is stride 2, where flax 'SAME' pads
        # asymmetrically (0,1) but torch `padding=1` pads (1,1) — the
        # explicit symmetric padding keeps the feature grid aligned with
        # reference checkpoints (`modified_resnet.py:100`).
        x = nn.relu(bn("bn1")(nn.Conv(
            self.width // 2, (3, 3), strides=(2, 2), use_bias=False,
            padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1",
        )(x)))
        x = nn.relu(bn("bn2")(nn.Conv(
            self.width // 2, (3, 3), use_bias=False, dtype=self.dtype, name="conv2"
        )(x)))
        x = nn.relu(bn("bn3")(nn.Conv(
            self.width, (3, 3), use_bias=False, dtype=self.dtype, name="conv3"
        )(x)))
        x = _avg_pool(x, 2)

        for stage, (planes_mult, n_blocks) in enumerate(
            zip((1, 2, 4, 8), self.layers), start=1
        ):
            stride = 1 if stage == 1 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    planes=self.width * planes_mult,
                    stride=stride if b == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{stage}_{b}",
                )(x, deterministic=deterministic)

        embed_dim = self.width * 32
        return AttentionPool2d(
            embed_dim=embed_dim,
            num_heads=self.heads,
            output_dim=self.output_dim,
            spacial_dim=self.image_size // 32,
            dtype=self.dtype,
            name="attnpool",
        )(x)
