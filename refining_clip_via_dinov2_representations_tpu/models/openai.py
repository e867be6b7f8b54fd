"""OpenAI CLIP checkpoint loading (`src/open_clip/openai.py` +
`build_model_from_openai_state_dict`, `model.py:851-935`).

OpenAI ships TorchScript archives; we extract their state dict, infer the
architecture from tensor shapes, and build+load the flax model (QuickGELU
always on — OpenAI models were trained with it).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .config import parse_model_cfg
from .pretrained import (
    download_pretrained_from_url,
    get_pretrained_cfg,
    list_pretrained_models_by_tag,
)


def list_openai_models() -> List[str]:
    """(`openai.py:16-21`)"""
    return list_pretrained_models_by_tag("openai")


def infer_openai_config(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Architecture from tensor shapes (`model.py:851-905`)."""
    def shape(k):
        t = state_dict[k]
        return tuple(t.shape)

    vit = "visual.proj" in state_dict
    if vit:
        vision_width = shape("visual.conv1.weight")[0]
        vision_layers = len(
            [k for k in state_dict
             if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
        )
        vision_patch_size = shape("visual.conv1.weight")[-1]
        grid = round((shape("visual.positional_embedding")[0] - 1) ** 0.5)
        image_size = vision_patch_size * grid
        vision_cfg = {
            "layers": vision_layers,
            "width": vision_width,
            "patch_size": vision_patch_size,
            "image_size": image_size,
        }
    else:
        counts = [
            len({k.split(".")[2] for k in state_dict if k.startswith(f"visual.layer{b}")})
            for b in (1, 2, 3, 4)
        ]
        vision_width = shape("visual.layer1.0.conv1.weight")[0]
        output_width = round(
            (shape("visual.attnpool.positional_embedding")[0] - 1) ** 0.5
        )
        vision_cfg = {
            "layers": counts,
            "width": vision_width,
            "patch_size": None,
            "image_size": output_width * 32,
        }

    embed_dim = shape("text_projection")[1]
    return {
        "embed_dim": embed_dim,
        "quick_gelu": True,  # OpenAI models were trained with QuickGELU
        "vision_cfg": vision_cfg,
        "text_cfg": {
            "context_length": shape("positional_embedding")[0],
            "vocab_size": shape("token_embedding.weight")[0],
            "width": shape("ln_final.weight")[0],
            "heads": shape("ln_final.weight")[0] // 64,
            "layers": len(
                {k.split(".")[2] for k in state_dict if k.startswith("transformer.resblocks")}
            ),
        },
    }


def load_openai_state_dict(checkpoint_path: str) -> Dict[str, Any]:
    """TorchScript archive (or plain state dict) → state dict
    (`openai.py:48-68`)."""
    import torch

    try:
        model = torch.jit.load(checkpoint_path, map_location="cpu").eval()
        state_dict = model.state_dict()
        for key in ("input_resolution", "context_length", "vocab_size"):
            state_dict.pop(key, None)
    except RuntimeError:
        state_dict = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
        if "state_dict" in state_dict:
            state_dict = state_dict["state_dict"]
    return state_dict


def load_openai_model(
    name: str,
    precision: str = "fp32",
    cache_dir: Optional[str] = None,
) -> Tuple[Any, Dict[str, Any]]:
    """Build (model, variables) from an OpenAI checkpoint
    (`openai.py:24-90`). `name` is a model name with an 'openai' tag, or a
    local checkpoint path."""
    import os

    from .clip import build_model
    from .convert import convert_clip_variables
    from .factory import _merge_params, _precision_to_dtype

    if os.path.isfile(name):
        checkpoint_path = name
    else:
        cfg_entry = get_pretrained_cfg(name, "openai")
        if not cfg_entry:
            raise RuntimeError(
                f"Model {name} not found; available openai models: {list_openai_models()}"
            )
        checkpoint_path = download_pretrained_from_url(
            cfg_entry["url"], cache_dir=cache_dir
        )

    state_dict = load_openai_state_dict(checkpoint_path)
    raw_cfg = infer_openai_config(state_dict)
    cfg = parse_model_cfg(raw_cfg)
    compute_dtype, _ = _precision_to_dtype(precision)
    model = build_model(cfg, dtype=compute_dtype)

    import jax
    import jax.numpy as jnp

    from .config import to_2tuple

    ih, iw = to_2tuple(cfg.vision_cfg.image_size)
    init_vars = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, ih, iw, 3), compute_dtype),
        jnp.zeros((1, cfg.text_cfg.context_length), jnp.int32),
    )
    loaded = convert_clip_variables(state_dict)
    params, missing, unexpected = _merge_params(init_vars["params"], loaded["params"])
    if missing or unexpected:
        raise ValueError(f"openai checkpoint mismatch: {missing[:5]} {unexpected[:5]}")
    variables = dict(init_vars)
    variables["params"] = params
    if "batch_stats" in loaded and "batch_stats" in init_vars:
        bs, _, _ = _merge_params(init_vars["batch_stats"], loaded["batch_stats"])
        variables["batch_stats"] = bs
    return model, variables
