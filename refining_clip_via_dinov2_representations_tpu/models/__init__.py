from .config import (
    CLIPModelCfg,
    CLIPTextCfg,
    CLIPVisionCfg,
    MultimodalCfg,
    add_model_config,
    get_model_config,
    list_models,
    parse_model_cfg,
    register_model_config,
)
from .clip import CLIP, build_model, l2_normalize
from .transformer import (
    MultimodalTransformer,
    TextTransformer,
    Transformer,
    VisionTransformer,
    text_global_pool,
)
from .convert import convert_clip_state_dict, flax_params_to_torch_state_dict

__all__ = [
    "CLIP",
    "CLIPModelCfg",
    "CLIPTextCfg",
    "CLIPVisionCfg",
    "MultimodalCfg",
    "MultimodalTransformer",
    "TextTransformer",
    "Transformer",
    "VisionTransformer",
    "add_model_config",
    "build_model",
    "convert_clip_state_dict",
    "flax_params_to_torch_state_dict",
    "get_model_config",
    "l2_normalize",
    "list_models",
    "parse_model_cfg",
    "register_model_config",
    "text_global_pool",
]
