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


def load_ref(module: str):
    """Import e.g. load_ref('model') -> reference src/open_clip/model.py."""
    _ensure_pkg()
    return importlib.import_module(f"ref_open_clip.{module}")


def reference_available() -> bool:
    import os

    return os.path.isdir(REF_SRC)
