"""TPU-native rebuild of Refining-CLIP-via-DINOv2-representations.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference PyTorch repo (an open_clip fork adding DINOv2 structural soft
targets). Public API mirrors `open_clip`'s surface
(reference `src/open_clip/__init__.py:1-18`).
"""

__version__ = "0.1.0"

from .constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD
from .tokenizer import SimpleTokenizer, HFTokenizer, SigLipTokenizer, tokenize, decode
from .models import (
    CLIP,
    CLIPModelCfg,
    CLIPTextCfg,
    CLIPVisionCfg,
    add_model_config,
    build_model,
    convert_clip_state_dict,
    get_model_config,
    list_models,
    parse_model_cfg,
)
