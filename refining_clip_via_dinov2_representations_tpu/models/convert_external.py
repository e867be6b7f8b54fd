"""External checkpoint-format converters (`src/open_clip/convert.py`).

* big_vision SigLIP `.npz` → our flax text tower. big_vision is itself JAX,
  so unlike the reference (which transposes everything into torch layouts,
  `convert.py:13-156`) the kernels map 1:1; only the per-head attention
  tensors need fusing into our `(D, 3D)` fused-QKV layout. The SigLIP image
  side targets timm towers in the reference; a native SigLIP vision port is
  tracked for the next round — `load_big_vision_weights` converts the text
  tower and logit scale/bias and reports what it skipped.

* MobileCLIP text encoder → open_clip key layout (`convert.py:158-197`).
  The text-side renames are mechanical and implemented here; the image side
  requires timm's FastViT checkpoint filter and raises with guidance.

* `convert_state_dict` — detection/dispatch mirroring `convert.py:199-206`.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _fuse_qkv(q_k, k_k, v_k, q_b, k_b, v_b) -> Tuple[np.ndarray, np.ndarray]:
    """big_vision attention params [D, H, Dh] (+bias [H, Dh]) → fused
    (D, 3D) kernel + (3D,) bias."""
    d = q_k.shape[0]
    kernel = np.concatenate(
        [t.reshape(d, -1) for t in (q_k, k_k, v_k)], axis=1
    ).astype(np.float32)
    bias = np.concatenate([t.reshape(-1) for t in (q_b, k_b, v_b)]).astype(np.float32)
    return kernel, bias


def load_big_vision_text_params(npz: Mapping[str, np.ndarray], prefix: str = "params/txt/") -> Dict[str, Any]:
    """Map the `txt/` side of a big_vision SigLIP checkpoint onto our
    TextTransformer param tree (no_causal_mask, pool 'last', Dense
    text_projection — the SigLIP text config)."""
    def g(key):
        for cand in (prefix + key, "txt/" + key, key):
            if cand in npz:
                return np.asarray(npz[cand], np.float32)
        raise KeyError(prefix + key)

    params: Dict[str, Any] = {
        "token_embedding": {"embedding": g("Embed_0/embedding")},
        "positional_embedding": g("pos_embedding").reshape(-1, g("Embed_0/embedding").shape[1]),
        "ln_final": {"scale": g("Encoder_0/encoder_norm/scale"),
                     "bias": g("Encoder_0/encoder_norm/bias")},
        "text_projection": {"kernel": g("head/kernel"), "bias": g("head/bias")},
        "transformer": {},
    }

    i = 0
    while True:
        bp = f"Encoder_0/encoderblock_{i}/"
        try:
            ln1s = g(bp + "LayerNorm_0/scale")
        except KeyError:
            break
        mha = bp + "MultiHeadDotProductAttention_0/"
        kernel, bias = _fuse_qkv(
            g(mha + "query/kernel"), g(mha + "key/kernel"), g(mha + "value/kernel"),
            g(mha + "query/bias"), g(mha + "key/bias"), g(mha + "value/bias"),
        )
        d = kernel.shape[0]
        out_k = g(mha + "out/kernel").reshape(d, d)
        params["transformer"][f"resblocks_{i}"] = {
            "ln_1": {"scale": ln1s, "bias": g(bp + "LayerNorm_0/bias")},
            "attn": {
                "in_proj_kernel": kernel,
                "in_proj_bias": bias,
                "out_proj": {"kernel": out_k, "bias": g(mha + "out/bias")},
            },
            "ln_2": {"scale": g(bp + "LayerNorm_1/scale"),
                     "bias": g(bp + "LayerNorm_1/bias")},
            "mlp": {
                "c_fc": {"kernel": g(bp + "MlpBlock_0/Dense_0/kernel"),
                         "bias": g(bp + "MlpBlock_0/Dense_0/bias")},
                "c_proj": {"kernel": g(bp + "MlpBlock_0/Dense_1/kernel"),
                           "bias": g(bp + "MlpBlock_0/Dense_1/bias")},
            },
        }
        i += 1
    return params


def load_big_vision_image_params(
    npz: Mapping[str, np.ndarray], prefix: str = "params/img/"
) -> Dict[str, Any]:
    """Map the `img/` side of a big_vision SigLIP checkpoint onto our native
    `SiglipVisionTower` params (`convert.py:40-117`'s `_convert_timm_img`,
    re-targeted: big_vision is flax, so conv/dense kernels map 1:1; only the
    per-head attention tensors fuse into the (D, 3D) layout)."""

    def g(key):
        for cand in (prefix + key, "img/" + key, key):
            if cand in npz:
                return np.asarray(npz[cand], np.float32)
        raise KeyError(prefix + key)

    width = g("embedding/bias").shape[0]
    params: Dict[str, Any] = {
        "patch_embedding": {"kernel": g("embedding/kernel"),
                            "bias": g("embedding/bias")},
        "position_embedding": g("pos_embedding").reshape(-1, width),
        "post_layernorm": {"scale": g("Transformer/encoder_norm/scale"),
                           "bias": g("Transformer/encoder_norm/bias")},
    }

    i = 0
    while True:
        bp = f"Transformer/encoderblock_{i}/"
        try:
            ln1s = g(bp + "LayerNorm_0/scale")
        except KeyError:
            break
        mha = bp + "MultiHeadDotProductAttention_0/"
        kernel, bias = _fuse_qkv(
            g(mha + "query/kernel"), g(mha + "key/kernel"), g(mha + "value/kernel"),
            g(mha + "query/bias"), g(mha + "key/bias"), g(mha + "value/bias"),
        )
        params[f"layers_{i}"] = {
            "layer_norm1": {"scale": ln1s, "bias": g(bp + "LayerNorm_0/bias")},
            "attn": {
                "in_proj_kernel": kernel,
                "in_proj_bias": bias,
                "out_proj": {"kernel": g(mha + "out/kernel").reshape(width, width),
                             "bias": g(mha + "out/bias")},
            },
            "layer_norm2": {"scale": g(bp + "LayerNorm_1/scale"),
                            "bias": g(bp + "LayerNorm_1/bias")},
            "fc1": {"kernel": g(bp + "MlpBlock_0/Dense_0/kernel"),
                    "bias": g(bp + "MlpBlock_0/Dense_0/bias")},
            "fc2": {"kernel": g(bp + "MlpBlock_0/Dense_1/kernel"),
                    "bias": g(bp + "MlpBlock_0/Dense_1/bias")},
        }
        i += 1

    # MAP pooling head (`MAPHead_0`; reference convert.py:98-117)
    map_p = "MAPHead_0/"
    mha = map_p + "MultiHeadDotProductAttention_0/"
    kernel, bias = _fuse_qkv(
        g(mha + "query/kernel"), g(mha + "key/kernel"), g(mha + "value/kernel"),
        g(mha + "query/bias"), g(mha + "key/bias"), g(mha + "value/bias"),
    )
    params["probe"] = g(map_p + "probe").reshape(1, width)
    params["head_attn"] = {
        "in_proj_kernel": kernel,
        "in_proj_bias": bias,
        "out_proj": {"kernel": g(mha + "out/kernel").reshape(width, width),
                     "bias": g(mha + "out/bias")},
    }
    params["head_layernorm"] = {"scale": g(map_p + "LayerNorm_0/scale"),
                                "bias": g(map_p + "LayerNorm_0/bias")}
    params["head_fc1"] = {"kernel": g(map_p + "MlpBlock_0/Dense_0/kernel"),
                          "bias": g(map_p + "MlpBlock_0/Dense_0/bias")}
    params["head_fc2"] = {"kernel": g(map_p + "MlpBlock_0/Dense_1/kernel"),
                          "bias": g(map_p + "MlpBlock_0/Dense_1/bias")}
    return params


def load_big_vision_weights(checkpoint_path: str) -> Dict[str, Any]:
    """Full big_vision SigLIP load (`convert.py:13-156`): image tower + text
    tower + logit scale/bias. Returns a flax param fragment
    {'visual': ..., 'text': ..., 'logit_scale': ..., 'logit_bias': ...}."""
    npz = np.load(checkpoint_path)
    keys = set(npz.keys())
    prefix = "params/" if any(k.startswith("params/") for k in keys) else ""
    out: Dict[str, Any] = {"text": load_big_vision_text_params(npz, prefix + "txt/")}
    if any(k.startswith((prefix + "img/", "img/")) for k in keys):
        out["visual"] = load_big_vision_image_params(npz, prefix + "img/")
    for name, key in (("logit_scale", "t"), ("logit_bias", "b")):
        for cand in (prefix + key, key):
            if cand in keys:
                out[name] = np.asarray(npz[cand], np.float32).reshape(())
    return out


def convert_mobileclip_text_state_dict(
    state_dict: Mapping[str, Any], prefix: str = "text_encoder."
) -> Dict[str, Any]:
    """MobileCLIP text-encoder keys → open_clip layout (`convert.py:169-190`),
    consumable by `convert_clip_state_dict`."""
    text_dict: Dict[str, Any] = {}
    for k, v in state_dict.items():
        if not k.startswith(prefix):
            continue
        k = k[len(prefix):]
        k = k.replace("projection_layer", "text_projection")
        k = k.replace("embedding_layer", "token_embedding")
        if k.startswith("positional_embedding.pos_embed.pos_embed"):
            k = k.replace("positional_embedding.pos_embed.pos_embed", "positional_embedding")
            v = np.asarray(v).squeeze()
        k = k.replace("final_layer_norm", "ln_final")
        k = k.replace("pre_norm_mha.0", "ln_1")
        k = k.replace("pre_norm_mha.1", "attn")
        k = k.replace("pre_norm_ffn.0", "ln_2")
        k = k.replace("pre_norm_ffn.1", "mlp.c_fc")
        k = k.replace("pre_norm_ffn.4", "mlp.c_proj")
        k = k.replace("qkv_proj.weight", "in_proj_weight")
        k = k.replace("qkv_proj.bias", "in_proj_bias")
        k = k.replace("transformer.", "transformer.resblocks.")
        text_dict["text." + k] = v
    return text_dict


_MOBILECLIP_S_KEY = "image_encoder.model.patch_embed.0.rbr_conv.0.conv.weight"
_MOBILECLIP_B_KEY = "image_encoder.model.patch_emb.0.block.conv.weight"


def convert_state_dict(model_cfg, state_dict: Mapping[str, Any]) -> Mapping[str, Any]:
    """Auto-detect external layouts (`convert.py:199-206`)."""
    if _MOBILECLIP_S_KEY in state_dict or _MOBILECLIP_B_KEY in state_dict:
        text = convert_mobileclip_text_state_dict(state_dict)
        if not text:
            raise ValueError("MobileCLIP checkpoint detected but no text_encoder keys found")
        if "logit_scale" in state_dict:
            text["logit_scale"] = state_dict["logit_scale"]
        import logging

        logging.warning(
            "MobileCLIP image tower (FastViT) has no native port yet; converted "
            "the text encoder + logit_scale only."
        )
        return text
    return state_dict
