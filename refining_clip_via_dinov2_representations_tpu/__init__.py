"""TPU-native rebuild of Refining-CLIP-via-DINOv2-representations.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference PyTorch repo (an open_clip fork adding DINOv2 structural soft
targets). Public API mirrors `open_clip`'s surface
(reference `src/open_clip/__init__.py:1-18`).
"""

from .version import __version__

from .constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD
from .tokenizer import SimpleTokenizer, HFTokenizer, SigLipTokenizer, tokenize, decode
from .transform import (
    AugmentationCfg,
    PreprocessCfg,
    image_transform,
    image_transform_v2,
)
from .models import (
    CLIP,
    CLIPModelCfg,
    CLIPTextCfg,
    CLIPVisionCfg,
    TracedModel,
    add_model_config,
    build_model,
    convert_clip_state_dict,
    convert_weights_to_fp16,
    convert_weights_to_lp,
    create_model,
    create_model_and_transforms,
    create_model_from_pretrained,
    download_pretrained,
    download_pretrained_from_url,
    get_cast_dtype,
    get_input_dtype,
    get_model_config,
    get_model_preprocess_cfg,
    get_model_tokenize_cfg,
    get_pretrained_cfg,
    get_pretrained_url,
    get_tokenizer,
    is_pretrained_cfg,
    list_models,
    list_pretrained,
    load_checkpoint,
    parse_model_cfg,
    set_model_preprocess_cfg,
    trace_model,
)
from .inference import (
    ClipInferenceEngine,
    create_engine,
    load_exported,
    load_exported_sharded,
)
from .utils import to_2tuple, feature_take_indices, get_2d_sincos_pos_embed
from .models.openai import load_openai_model, list_openai_models
from .models import CoCa, coca_generate, coca_generate_beam
from .models.clip import CLIP as CustomTextCLIP  # one flax module covers both
from .models.pretrained import (
    list_pretrained_models_by_tag,
    list_pretrained_tags_by_model,
)
from .models.push_to_hf_hub import push_pretrained_to_hf_hub, push_to_hf_hub
from .eval import (
    IMAGENET_CLASSNAMES,
    OPENAI_IMAGENET_TEMPLATES,
    SIMPLE_IMAGENET_TEMPLATES,
    build_zero_shot_classifier,
    build_zero_shot_classifier_legacy,
)
from .losses import (
    ClipLoss,
    ClipLossWithDINOEnhancements,
    CoCaLoss,
    CyCLIPLoss,
    DinoLossCfg,
    DinoProjectionHead,
    DistillClipLoss,
    SigLipLoss,
    clip_loss,
    coca_loss,
    create_loss,
    cyclip_loss,
    dino_enhanced_loss,
    distill_clip_loss,
    siglip_loss,
)
