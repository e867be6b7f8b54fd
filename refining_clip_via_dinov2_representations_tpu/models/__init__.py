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
from .coca import CoCa, generate as coca_generate, generate_beam as coca_generate_beam
from .dinov2 import Dinov2, Dinov2Cfg, convert_dinov2_state_dict, load_dinov2_model
from .resnet import ModifiedResNet
from .convert import convert_clip_variables
from .transformer import (
    MultimodalTransformer,
    TextTransformer,
    Transformer,
    VisionTransformer,
    text_global_pool,
)
from .convert import convert_clip_state_dict, flax_params_to_torch_state_dict
from .factory import (
    create_model,
    create_model_and_transforms,
    create_model_from_pretrained,
    get_tokenizer,
    load_checkpoint,
)
from .pretrained import (
    download_pretrained,
    download_pretrained_from_url,
    get_pretrained_cfg,
    get_pretrained_url,
    is_pretrained_cfg,
    list_pretrained,
    list_pretrained_models_by_tag,
    list_pretrained_tags_by_model,
)
from .api_utils import (
    TracedModel,
    convert_weights_to_fp16,
    convert_weights_to_lp,
    get_cast_dtype,
    get_input_dtype,
    get_model_preprocess_cfg,
    get_model_tokenize_cfg,
    set_model_preprocess_cfg,
    trace_model,
)

__all__ = [
    "TracedModel",
    "convert_weights_to_fp16",
    "convert_weights_to_lp",
    "download_pretrained",
    "download_pretrained_from_url",
    "get_cast_dtype",
    "get_input_dtype",
    "get_model_preprocess_cfg",
    "get_model_tokenize_cfg",
    "get_pretrained_url",
    "is_pretrained_cfg",
    "set_model_preprocess_cfg",
    "trace_model",
    "CLIP",
    "create_model",
    "create_model_and_transforms",
    "create_model_from_pretrained",
    "get_pretrained_cfg",
    "get_tokenizer",
    "list_pretrained",
    "list_pretrained_models_by_tag",
    "list_pretrained_tags_by_model",
    "load_checkpoint",
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
