"""External checkpoint-format converters (`src/open_clip/convert.py`).

* big_vision SigLIP `.npz` → our flax text tower. big_vision is itself JAX,
  so unlike the reference (which transposes everything into torch layouts,
  `convert.py:13-156`) the kernels map 1:1; only the per-head attention
  tensors need fusing into our `(D, 3D)` fused-QKV layout. The SigLIP image
  side targets timm towers in the reference; a native SigLIP vision port is
  tracked for the next round — `load_big_vision_weights` converts the text
  tower and logit scale/bias and reports what it skipped.

* MobileCLIP text encoder → open_clip key layout (`convert.py:158-197`)
  plus both image sides: Apple's raw FastViT layout (S1/S2, ``rbr_*``
  names + flat ``network.N`` stage list, re-keyed like timm's
  ``checkpoint_filter_fn``) and the MCi-B hybrid-ViT layout, converted via
  the timm-layout converters in `models/fastvit.py`.

* `convert_state_dict` / `load_mobileclip_variables` — detection/dispatch
  mirroring `convert.py:199-206`.
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

# Apple ml-fastvit/ml-mobileclip attribute names -> timm fastvit names
# (the renames timm's `checkpoint_filter_fn` applies; `convert.py:158-167`)
_APPLE_FASTVIT_RENAMES = (
    ("patch_embed.", "stem."),
    ("rbr_conv", "conv_kxk"),
    ("rbr_scale", "conv_scale"),
    ("rbr_skip", "identity"),
    ("conv_exp.", "final_conv."),
    ("lkb_origin", "large_conv"),
    ("convffn", "mlp"),
    ("se.reduce", "se.fc1"),
    ("se.expand", "se.fc2"),
)


def convert_mobileclip_s_image_state_dict(
    state_dict: Mapping[str, Any], prefix: str = "image_encoder.model."
) -> Dict[str, Any]:
    """Apple MobileCLIP-S* raw layout (`image_encoder.model.*`, flat
    ``network.N`` stage list, ``rbr_*`` branch names) -> the timm fastvit
    layout consumed by `fastvit.convert_timm_fastvit_state_dict`
    (``visual.trunk.*``). Mirrors timm's `checkpoint_filter_fn`, which the
    reference leans on (`convert.py:160-166`).

    The flat ``network.N`` module list is re-keyed onto ``stages.S`` by
    role, inferred from the keys themselves: entries containing ``proj.``
    are stage downsamplers, entries containing ``.pe.``/``.pos_enc.`` are
    conditional position encodings, everything else is a block stage.
    """
    items = {}
    for k, v in state_dict.items():
        if not k.startswith(prefix):
            continue
        k = k[len(prefix):]
        for old, new in _APPLE_FASTVIT_RENAMES:
            k = k.replace(old, new)
        k = k.replace(".pe.", ".pos_enc.")
        items[k] = v

    # classify network indices by role, in order
    net_idx = sorted({
        int(k.split(".")[1]) for k in items if k.startswith("network.")
    })
    roles = {}
    for idx in net_idx:
        rests = [
            k.split(".", 2)[2] for k in items if k.startswith(f"network.{idx}.")
        ]
        if any(r.startswith("proj.") for r in rests):
            roles[idx] = "downsample"
        elif any(r.startswith("pos_enc.") for r in rests):
            roles[idx] = "pos_emb"
        else:
            roles[idx] = "stage"

    out: Dict[str, Any] = {}
    stage = 0
    remap: Dict[int, str] = {}
    for idx in net_idx:
        if roles[idx] == "stage":
            remap[idx] = f"stages.{stage}.blocks"
            stage += 1
        elif roles[idx] == "downsample":
            remap[idx] = f"stages.{stage}.downsample"
        else:
            remap[idx] = f"stages.{stage}.pos_emb"

    for k, v in items.items():
        if k.startswith("network."):
            parts = k.split(".")
            idx = int(parts[1])
            k = remap[idx] + "." + ".".join(parts[2:])
        if k.startswith("head."):
            arr = np.asarray(v)
            if k == "head.proj" and arr.ndim == 2:
                # bare CLIP-style projection matrix -> Linear head with
                # zero bias (timm checkpoint_filter_fn does the same)
                out["visual.trunk.head.fc.weight"] = arr.T
                out["visual.trunk.head.fc.bias"] = np.zeros(
                    arr.shape[1], np.float32
                )
                continue
            k = k.replace("head.weight", "head.fc.weight").replace("head.bias", "head.fc.bias")
        out["visual.trunk." + k] = v
    return out


def convert_mobileclip_b_image_state_dict(
    state_dict: Mapping[str, Any], prefix: str = "image_encoder.model."
) -> Dict[str, Any]:
    """Apple MobileCLIP-B raw image layout (ml-cvnets ViT naming, the same
    transformer naming scheme as the text side `convert.py:169-190`) ->
    the timm ``vit_base_mci_224`` layout consumed by
    `fastvit.convert_timm_mci_vit_state_dict` (``visual.trunk.*``)."""
    out: Dict[str, Any] = {}
    for k, v in state_dict.items():
        if not k.startswith(prefix):
            continue
        k = k[len(prefix):]
        k = k.replace("patch_emb.", "patch_embed.backbone.")
        k = k.replace(".block.conv.", ".conv.")
        k = k.replace(".block.norm.", ".bn.")
        if k.startswith("pos_embed.pos_embed.pos_embed"):
            k = "pos_embed"
            v = np.asarray(v).reshape(-1, np.asarray(v).shape[-1])
        k = k.replace("post_transformer_norm.", "norm.")
        k = k.replace("pre_norm_mha.0", "norm1")
        k = k.replace("pre_norm_mha.1", "attn")
        k = k.replace("pre_norm_ffn.0", "norm2")
        k = k.replace("pre_norm_ffn.1", "mlp.fc1")
        k = k.replace("pre_norm_ffn.4", "mlp.fc2")
        k = k.replace("qkv_proj.", "qkv.")
        k = k.replace("out_proj.", "proj.")
        if k.startswith("transformer."):
            k = k.replace("transformer.", "blocks.")
        if k.startswith(("classifier.proj", "head.proj")):
            arr = np.asarray(v)
            out["visual.trunk.head.weight"] = arr.T if arr.ndim == 2 else arr
            out["visual.trunk.head.bias"] = np.zeros(arr.shape[-1] if arr.ndim == 1 else arr.shape[1], np.float32)
            continue
        out["visual.trunk." + k] = v
    return out


def load_mobileclip_variables(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Full Apple MobileCLIP checkpoint -> flax variables fragment
    ``{'params': {...}, 'batch_stats': {...}}`` covering both towers +
    logit_scale (the composition `convert.py:199-206` + `factory.py`
    perform in the reference)."""
    from .convert import convert_clip_variables
    from .fastvit import (
        convert_timm_fastvit_state_dict,
        convert_timm_mci_vit_state_dict,
    )

    text_sd = convert_mobileclip_text_state_dict(state_dict)
    if not text_sd:
        raise ValueError("MobileCLIP checkpoint detected but no text_encoder keys found")
    if "logit_scale" in state_dict:
        text_sd["logit_scale"] = state_dict["logit_scale"]
    variables = dict(convert_clip_variables(text_sd, strict=False))

    if _MOBILECLIP_S_KEY in state_dict:
        timm_sd = convert_mobileclip_s_image_state_dict(state_dict)
        vis = convert_timm_fastvit_state_dict(timm_sd)
    else:
        timm_sd = convert_mobileclip_b_image_state_dict(state_dict)
        vis = convert_timm_mci_vit_state_dict(timm_sd)
    variables.setdefault("params", {})["visual"] = vis["params"]
    if vis.get("batch_stats"):
        variables.setdefault("batch_stats", {})["visual"] = vis["batch_stats"]
    return variables


def convert_state_dict(model_cfg, state_dict: Mapping[str, Any]) -> Mapping[str, Any]:
    """Auto-detect external layouts (`convert.py:199-206`). Returns either
    the input unchanged or a flax variables fragment (``params`` key
    present) for layouts that convert directly to our trees."""
    if _MOBILECLIP_S_KEY in state_dict or _MOBILECLIP_B_KEY in state_dict:
        return load_mobileclip_variables(state_dict)
    return state_dict
