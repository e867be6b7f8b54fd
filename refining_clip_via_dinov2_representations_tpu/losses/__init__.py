from .contrastive import (
    clip_logits,
    clip_loss,
    coca_loss,
    cross_entropy,
    cyclip_loss,
    distill_clip_loss,
    gather_features,
    siglip_loss,
)
from .dino import (
    DinoLossCfg,
    DinoProjectionHead,
    apply_projection,
    compute_student_tau,
    dino_enhanced_loss,
)
from .compat import (
    ClipLoss,
    ClipLossWithDINOEnhancements,
    CoCaLoss,
    CyCLIPLoss,
    DistillClipLoss,
    SigLipLoss,
    create_loss,
)

__all__ = [
    "ClipLoss",
    "ClipLossWithDINOEnhancements",
    "CoCaLoss",
    "CyCLIPLoss",
    "DistillClipLoss",
    "SigLipLoss",
    "create_loss",
    "DinoLossCfg",
    "DinoProjectionHead",
    "apply_projection",
    "clip_logits",
    "clip_loss",
    "coca_loss",
    "compute_student_tau",
    "cross_entropy",
    "cyclip_loss",
    "dino_enhanced_loss",
    "distill_clip_loss",
    "gather_features",
    "siglip_loss",
]
