"""Load the PyTorch reference implementation for golden-parity testing.

The reference at /root/reference is imported module-by-module under a
synthetic package name (`ref_open_clip`) so we can skip its package
`__init__` (which drags in torchvision-based transforms). Missing optional
deps (ftfy, torchvision) are stubbed minimally — the stubs only need to
satisfy imports that parity tests never exercise.

Tests import the reference solely to compare numerical outputs; no reference
code is copied into this repo.
"""

import importlib
import importlib.machinery
import importlib.util
import sys
import types

REF_SRC = "/root/reference/src"


def _stub_module(name):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = mod
    return mod


def _install_stubs():
    if "ftfy" not in sys.modules:
        try:
            import ftfy  # noqa: F401
        except ImportError:
            stub = _stub_module("ftfy")
            import unicodedata

            stub.fix_text = lambda s: unicodedata.normalize("NFC", s)

    if "braceexpand" not in sys.modules:
        try:
            import braceexpand  # noqa: F401
        except ImportError:
            stub = _stub_module("braceexpand")
            stub.braceexpand = lambda s: iter([s])

    if "webdataset" not in sys.modules:
        try:
            import webdataset  # noqa: F401
        except ImportError:
            wds = _stub_module("webdataset")
            filters = _stub_module("webdataset.filters")
            shardlists = _stub_module("webdataset.shardlists")
            utils = _stub_module("webdataset.utils")

            class PipelineStage:  # minimal base for detshuffle2 et al.
                pass

            wds.PipelineStage = PipelineStage
            wds.utils = utils
            wds.shardlists = shardlists
            filters._shuffle = lambda *a, **k: None
            utils.pytorch_worker_seed = lambda: 0
            shardlists.expand_urls = lambda urls: [urls]
            wds.filters = filters
            wds.__path__ = []
            tariterators = _stub_module("webdataset.tariterators")
            tariterators.base_plus_ext = lambda p: (p, "")
            tariterators.url_opener = lambda *a, **k: iter(())
            tariterators.tar_file_expander = lambda *a, **k: iter(())
            tariterators.valid_sample = lambda s: True
            wds.tariterators = tariterators

    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            import torch.nn as nn

            tv = _stub_module("torchvision")
            ops = _stub_module("torchvision.ops")
            misc = _stub_module("torchvision.ops.misc")

            class FrozenBatchNorm2d(nn.Module):  # minimal stand-in
                def __init__(self, num_features, eps=1e-5):
                    super().__init__()
                    self.eps = eps

            misc.FrozenBatchNorm2d = FrozenBatchNorm2d
            ops.misc = misc
            tv.ops = ops
            tv.__path__ = []  # mark as package so submodule imports resolve
            datasets = _stub_module("torchvision.datasets")
            datasets.ImageFolder = object
            tv.datasets = datasets

            # FUNCTIONAL transforms (tests/tv_stub.py): enough to run the
            # reference's image pipeline + full training CLI for the
            # dress-rehearsal parity runs, not just satisfy imports
            import tests.tv_stub as _tv_impl

            transforms = _stub_module("torchvision.transforms")
            for name in (
                "InterpolationMode", "Compose", "ToTensor", "Normalize",
                "Resize", "CenterCrop", "RandomResizedCrop", "Grayscale",
                "ColorJitter",
            ):
                setattr(transforms, name, getattr(_tv_impl, name))
            functional = _stub_module("torchvision.transforms.functional")
            for name in (
                "resize", "crop", "pad", "center_crop", "resized_crop",
                "to_tensor", "normalize", "InterpolationMode",
            ):
                setattr(functional, name, getattr(_tv_impl, name))
            transforms.functional = functional
            transforms.__path__ = []
            tv.transforms = transforms


def _ensure_pkg():
    if "ref_open_clip" in sys.modules:
        return
    _install_stubs()
    spec = importlib.machinery.ModuleSpec("ref_open_clip", None, is_package=True)
    pkg = importlib.util.module_from_spec(spec)
    pkg.__path__ = [REF_SRC + "/open_clip"]
    sys.modules["ref_open_clip"] = pkg

    train_spec = importlib.machinery.ModuleSpec("ref_open_clip_train", None, is_package=True)
    train_pkg = importlib.util.module_from_spec(train_spec)
    train_pkg.__path__ = [REF_SRC + "/open_clip_train"]
    sys.modules["ref_open_clip_train"] = train_pkg

    # some reference modules use absolute imports (`from open_clip_train import
    # ...`); alias the canonical names to the same synthetic packages
    sys.modules.setdefault("open_clip", pkg)
    sys.modules.setdefault("open_clip_train", train_pkg)

    # lazy attribute resolution for `from open_clip import X` without running
    # the reference package __init__ (which needs torchvision)
    def _pkg_getattr(name):
        # factory/transform resolve too now that the torchvision stub is
        # functional (tests/tv_stub.py) — the full reference training CLI
        # is drivable for the dress-rehearsal parity runs
        for mod_name in ("model", "tokenizer", "zero_shot_classifier",
                         "zero_shot_metadata", "loss", "factory", "transform",
                         "my_metrics"):
            try:
                mod = importlib.import_module(f"ref_open_clip.{mod_name}")
            except Exception:
                continue
            if hasattr(mod, name):
                return getattr(mod, name)
        raise AttributeError(name)

    pkg.__getattr__ = _pkg_getattr


def load_ref(module: str):
    """Import e.g. load_ref('model') -> reference src/open_clip/model.py."""
    _ensure_pkg()
    return importlib.import_module(f"ref_open_clip.{module}")


def load_ref_train(module: str):
    """Import e.g. load_ref_train('scheduler') -> src/open_clip_train/scheduler.py."""
    _ensure_pkg()
    return importlib.import_module(f"ref_open_clip_train.{module}")


def reference_available() -> bool:
    import os

    return os.path.isdir(REF_SRC)
