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
    add_model_config,
    build_model,
    convert_clip_state_dict,
    create_model,
    create_model_and_transforms,
    create_model_from_pretrained,
    get_model_config,
    get_pretrained_cfg,
    get_tokenizer,
    list_models,
    list_pretrained,
    load_checkpoint,
    parse_model_cfg,
)
from .inference import ClipInferenceEngine, create_engine, load_exported
from .utils import to_2tuple, feature_take_indices, get_2d_sincos_pos_embed
from .models.openai import load_openai_model, list_openai_models
from .losses import (
    DinoLossCfg,
    DinoProjectionHead,
    clip_loss,
    coca_loss,
    cyclip_loss,
    dino_enhanced_loss,
    distill_clip_loss,
    siglip_loss,
)
