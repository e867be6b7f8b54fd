from ._imagenet_metadata import (
    IMAGENET_CLASSNAMES,
    OPENAI_IMAGENET_TEMPLATES,
    SIMPLE_IMAGENET_TEMPLATES,
)
from .clip_blind import (
    align_dino_feats_to_paths,
    build_dino_path_maps,
    dedup_by_path,
    encode_clip_images_and_paths,
    pair_stats,
    run_clip_blind_on_split,
)
from .offline import (
    anisotropy,
    eval_geometry,
    extract_features,
    knn_top1,
    linear_probe,
    load_feats,
    save_feats,
    uniformity,
)
from .zero_shot_classifier import (
    build_zero_shot_classifier,
    build_zero_shot_classifier_legacy,
)

__all__ = [
    "IMAGENET_CLASSNAMES",
    "OPENAI_IMAGENET_TEMPLATES",
    "SIMPLE_IMAGENET_TEMPLATES",
    "align_dino_feats_to_paths",
    "anisotropy",
    "build_dino_path_maps",
    "build_zero_shot_classifier",
    "build_zero_shot_classifier_legacy",
    "dedup_by_path",
    "encode_clip_images_and_paths",
    "eval_geometry",
    "extract_features",
    "knn_top1",
    "linear_probe",
    "load_feats",
    "pair_stats",
    "run_clip_blind_on_split",
    "save_feats",
    "uniformity",
]
