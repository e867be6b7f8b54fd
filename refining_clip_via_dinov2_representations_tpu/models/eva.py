"""EVA01 vision towers (timm `eva_giant_patch14_*`) mapped onto the native ViT.

EVA01-giant (the `EVA01-g-14*` registry configs, BASELINE config 5's student
family) is architecturally a standard pre-LN ViT: class token, learned abs
pos embed (incl. CLS slot), no pre-transformer LN, fused-QKV attention where
the key bias is pinned to zero (timm's Eva quirk — q_bias/v_bias learnable,
k_bias a zero buffer), GELU MLP (ratio 6144/1408), final LN before token
pooling, and a *biased* classifier head acting as the CLIP projection
(`timm_model.py:56-66` builds the trunk with `num_classes=embed_dim` when
`timm_proj` is null).

So the native build is our `VisionTransformer` with `no_ln_pre=True`,
`proj_bias=True`; `convert_timm_eva_state_dict` maps hub checkpoints
(`visual.trunk.*`). NOTE: EVA02 (`eva02_*` names) adds rope + SwiGLU and is
NOT covered — those names still raise.

No local oracle exists for EVA (timm absent, no HF port); the converter is
structurally tested and flagged for value-verification on first real
checkpoint load.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

# timm name → (width, layers, heads, mlp_ratio, patch)
EVA01_DIMS = {
    "eva_giant_patch14_224": (1408, 40, 16, 6144 / 1408, 14),
    "eva_giant_patch14_336": (1408, 40, 16, 6144 / 1408, 14),
    "eva_giant_patch14_560": (1408, 40, 16, 6144 / 1408, 14),
}


def convert_timm_eva_state_dict(
    state_dict: Mapping[str, Any], prefix: str = "visual.trunk."
) -> Dict[str, Any]:
    """timm Eva layout → our VisionTransformer(no_ln_pre, proj_bias) params."""

    def t(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().float().numpy()
        return np.asarray(x, np.float32)

    p: Dict[str, Any] = {"transformer": {}}
    qkv_bias_parts: Dict[str, Dict[str, np.ndarray]] = {}

    def setp(path, val):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = val

    for key, val in state_dict.items():
        if not key.startswith(prefix):
            continue
        key = key[len(prefix):]
        parts = key.split(".")
        if key == "cls_token":
            setp(["class_embedding"], t(val).reshape(-1))
        elif key == "pos_embed":
            v = t(val)
            setp(["positional_embedding"], v.reshape(v.shape[-2], v.shape[-1]))
        elif key.startswith("patch_embed.proj."):
            if parts[-1] == "weight":
                setp(["conv1", "kernel"], t(val).transpose(2, 3, 1, 0))
            # NOTE: our conv1 is bias-free (OpenCLIP ViT); timm eva patch
            # embed has a bias — fold it into... it cannot be folded exactly;
            # stored separately and added by the loader below.
            else:
                setp(["conv1", "bias"], t(val))
        elif parts[0] == "blocks":
            i = parts[1]
            blk = p["transformer"].setdefault(f"resblocks_{i}", {})
            rest = parts[2:]

            def set_blk(path, val2):
                node = blk
                for k in path[:-1]:
                    node = node.setdefault(k, {})
                node[path[-1]] = val2

            if rest[0] in ("norm1", "norm2"):
                name = "ln_1" if rest[0] == "norm1" else "ln_2"
                set_blk([name, "scale" if rest[1] == "weight" else "bias"], t(val))
            elif rest[0] == "attn":
                if rest[1] == "qkv":
                    if rest[2] == "weight":
                        set_blk(["attn", "in_proj_kernel"], t(val).T)
                    else:
                        set_blk(["attn", "in_proj_bias"], t(val))
                elif rest[1] in ("q_bias", "v_bias"):
                    qkv_bias_parts.setdefault(f"resblocks_{i}", {})[rest[1]] = t(val)
                elif rest[1] == "k_bias":
                    pass  # zero buffer
                elif rest[1] == "proj":
                    leaf = "kernel" if rest[2] == "weight" else "bias"
                    set_blk(["attn", "out_proj", leaf],
                            t(val).T if rest[2] == "weight" else t(val))
                elif rest[1] in ("q_norm", "k_norm"):
                    raise KeyError(f"EVA02-style attention norm not supported: {key}")
                else:
                    raise KeyError(key)
            elif rest[0] == "mlp":
                name = "c_fc" if rest[1] == "fc1" else "c_proj"
                leaf = "kernel" if rest[2] == "weight" else "bias"
                set_blk(["mlp", name, leaf], t(val).T if rest[2] == "weight" else t(val))
            else:
                raise KeyError(key)
        elif parts[0] == "norm":
            setp(["ln_post", "scale" if parts[1] == "weight" else "bias"], t(val))
        elif parts[0] == "head":
            leaf = "kernel" if parts[1] == "weight" else "bias"
            setp(["proj", leaf], t(val).T if parts[1] == "weight" else t(val))
        elif parts[0] in ("fc_norm",):
            raise KeyError(f"avg-pool EVA variant not supported: {key}")

    # separate q/v biases (k pinned to zero) → fused in_proj_bias
    for name, parts_d in qkv_bias_parts.items():
        q_b = parts_d["q_bias"]
        v_b = parts_d["v_bias"]
        bias = np.concatenate([q_b, np.zeros_like(q_b), v_b])
        p["transformer"][name].setdefault("attn", {})["in_proj_bias"] = bias
    return p


def eva_params_to_timm_state_dict(
    visual: Mapping[str, Any], prefix: str = "visual.trunk."
) -> Dict[str, Any]:
    """Inverse of `convert_timm_eva_state_dict`: flax VisionTransformer
    params (EVA01 flavor: no ln_pre, Dense proj head, patch-embed bias) →
    timm `eva_giant_*` layout. QKV bias is emitted fused (`attn.qkv.bias`,
    a layout timm's Eva supports) so the roundtrip is exact even when the
    k-slice is nonzero (softmax is invariant to k-bias, but we keep it)."""
    if "ln_pre" in visual:
        raise NotImplementedError(
            "tower has ln_pre: not an EVA01 trunk (timm Eva has no pre-LN); "
            "no timm-layout exporter for this ViT variant"
        )
    sd: Dict[str, Any] = {}

    def put(key, val):
        sd[prefix + key] = np.asarray(val, np.float32)

    put("cls_token", np.asarray(visual["class_embedding"]).reshape(1, 1, -1))
    pe = np.asarray(visual["positional_embedding"])
    put("pos_embed", pe.reshape(1, *pe.shape))
    put("patch_embed.proj.weight",
        np.transpose(np.asarray(visual["conv1"]["kernel"]), (3, 2, 0, 1)))
    if "bias" in visual["conv1"]:
        put("patch_embed.proj.bias", visual["conv1"]["bias"])

    for name, blk in visual["transformer"].items():
        i = name.split("_")[-1]
        tp = f"blocks.{i}"
        put(f"{tp}.norm1.weight", blk["ln_1"]["scale"])
        put(f"{tp}.norm1.bias", blk["ln_1"]["bias"])
        put(f"{tp}.norm2.weight", blk["ln_2"]["scale"])
        put(f"{tp}.norm2.bias", blk["ln_2"]["bias"])
        put(f"{tp}.attn.qkv.weight", np.asarray(blk["attn"]["in_proj_kernel"]).T)
        put(f"{tp}.attn.qkv.bias", blk["attn"]["in_proj_bias"])
        put(f"{tp}.attn.proj.weight", np.asarray(blk["attn"]["out_proj"]["kernel"]).T)
        put(f"{tp}.attn.proj.bias", blk["attn"]["out_proj"]["bias"])
        put(f"{tp}.mlp.fc1.weight", np.asarray(blk["mlp"]["c_fc"]["kernel"]).T)
        put(f"{tp}.mlp.fc1.bias", blk["mlp"]["c_fc"]["bias"])
        put(f"{tp}.mlp.fc2.weight", np.asarray(blk["mlp"]["c_proj"]["kernel"]).T)
        put(f"{tp}.mlp.fc2.bias", blk["mlp"]["c_proj"]["bias"])

    put("norm.weight", visual["ln_post"]["scale"])
    put("norm.bias", visual["ln_post"]["bias"])
    put("head.weight", np.asarray(visual["proj"]["kernel"]).T)
    if "bias" in visual["proj"]:
        put("head.bias", visual["proj"]["bias"])
    return sd
