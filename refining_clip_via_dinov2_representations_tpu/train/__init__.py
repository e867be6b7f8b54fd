from .data import (
    CsvDataset,
    DataInfo,
    DinoFeatureStore,
    ImageFolderDataset,
    Loader,
    SyntheticDataset,
    get_data,
    load_dino_index_map,
)
from .distributed import broadcast_object, init_distributed_device, is_master
from .evaluate import evaluate
from .file_utils import check_exists, pt_load, remote_sync, start_sync_process
from .helpers import dataset_retrieval_score, epoch_retrieval_score
from .logger import setup_logging
from .params import parse_args
from .metrics import (
    build_unique_image_features,
    clip_retrieval_metrics,
    get_clip_metrics,
)
from .optim import OptimCfg, build_optimizer, label_params
from .scheduler import const_lr, const_lr_cooldown, cosine_lr, make_schedule
from .step import StepCfg, TrainState, create_train_state, make_train_step

__all__ = [
    "CsvDataset",
    "DataInfo",
    "DinoFeatureStore",
    "ImageFolderDataset",
    "Loader",
    "OptimCfg",
    "StepCfg",
    "SyntheticDataset",
    "TrainState",
    "build_optimizer",
    "build_unique_image_features",
    "clip_retrieval_metrics",
    "const_lr",
    "const_lr_cooldown",
    "cosine_lr",
    "create_train_state",
    "dataset_retrieval_score",
    "epoch_retrieval_score",
    "evaluate",
    "get_clip_metrics",
    "get_data",
    "label_params",
    "load_dino_index_map",
    "make_schedule",
    "make_train_step",
    # reference `helpers.py:484-498` re-export surface
    "broadcast_object",
    "check_exists",
    "init_distributed_device",
    "is_master",
    "parse_args",
    "pt_load",
    "remote_sync",
    "setup_logging",
    "start_sync_process",
]
