"""Dataset normalization constants.

Mirrors the constant surface of the reference `src/open_clip/constants.py:1-6`
(OpenAI CLIP RGB mean/std plus ImageNet/Inception/HF-hub naming constants).
"""

OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

INCEPTION_MEAN = (0.5, 0.5, 0.5)
INCEPTION_STD = (0.5, 0.5, 0.5)

# Hub artifact filenames kept name-compatible with the reference so checkpoints
# written by either implementation interoperate.
HF_WEIGHTS_NAME = "open_clip_pytorch_model.bin"
HF_SAFE_WEIGHTS_NAME = "open_clip_model.safetensors"
HF_CONFIG_NAME = "open_clip_config.json"
