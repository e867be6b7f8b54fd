"""Pretrained-weight registry + download helpers.

API surface of the reference `src/open_clip/pretrained.py` over the data
table in `_pretrained_data.py` (99 models / 180 tags). Downloads go through
`huggingface_hub` when available or urllib with sha256 verification;
checkpoints land in `~/.cache/open_clip_tpu` and are loaded via the torch →
flax converter.
"""

from __future__ import annotations

import copy
import hashlib
import os
import urllib.request
import warnings
from typing import Dict, Iterable, List, Optional, Tuple

from ._pretrained_data import PRETRAINED as _PRETRAINED

try:
    from huggingface_hub import hf_hub_download

    _has_hf_hub = True
except ImportError:  # pragma: no cover
    hf_hub_download = None
    _has_hf_hub = False

HF_HUB_PREFIX = "hf-hub:"
CACHE_DIR = os.environ.get(
    "OPEN_CLIP_CACHE_DIR", os.path.expanduser("~/.cache/open_clip_tpu")
)


def _clean_tag(tag: str) -> str:
    return tag.lower().replace("-", "_")


def list_pretrained(as_str: bool = False):
    """(model, tag) pairs with known pretrained weights."""
    return [
        f"{m}:{t}" if as_str else (m, t)
        for m in _PRETRAINED
        for t in _PRETRAINED[m]
    ]


def list_pretrained_models_by_tag(tag: str) -> List[str]:
    tag = _clean_tag(tag)
    return [m for m in _PRETRAINED if tag in _PRETRAINED[m]]


def list_pretrained_tags_by_model(model: str) -> List[str]:
    return list(_PRETRAINED.get(model, {}).keys())


def is_pretrained_cfg(model: str, tag: str) -> bool:
    return _clean_tag(tag) in _PRETRAINED.get(model, {})


def get_pretrained_cfg(model: str, tag: str) -> Dict:
    if model not in _PRETRAINED:
        return {}
    return copy.deepcopy(_PRETRAINED[model].get(_clean_tag(tag), {}))


def get_pretrained_url(model: str, tag: str) -> str:
    return get_pretrained_cfg(model, tag).get("url", "")


def has_hf_hub(necessary: bool = False) -> bool:
    if not _has_hf_hub and necessary:
        raise RuntimeError(
            "huggingface_hub is required to download from the hub; install it or "
            "pass a local checkpoint path"
        )
    return _has_hf_hub


def download_pretrained_from_url(url: str, cache_dir: Optional[str] = None) -> str:
    """Download + sha256-prefix verification (reference `pretrained.py:787-845`)."""
    cache_dir = cache_dir or CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    filename = os.path.basename(urllib.parse.urlsplit(url).path)

    expected_sha256 = ""
    if "openaipublic" in url:
        expected_sha256 = url.split("/")[-2]

    target = os.path.join(cache_dir, filename)
    if os.path.exists(target):
        if not expected_sha256 or _sha_ok(target, expected_sha256):
            return target
        warnings.warn(f"{target} exists but SHA256 mismatch; re-downloading")

    urllib.request.urlretrieve(url, target)
    if expected_sha256 and not _sha_ok(target, expected_sha256):
        raise RuntimeError("Downloaded checkpoint failed SHA256 verification")
    return target


def _sha_ok(path: str, expected_prefix: str) -> bool:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest().startswith(expected_prefix)


def _safe_alternatives(filename: str) -> Iterable[str]:
    if filename == "open_clip_pytorch_model.bin":
        yield "open_clip_model.safetensors"
    if filename == "pytorch_model.bin":
        yield "model.safetensors"


def download_pretrained_from_hf(
    model_id: str,
    filename: str = "open_clip_pytorch_model.bin",
    cache_dir: Optional[str] = None,
    revision: Optional[str] = None,
) -> str:
    has_hf_hub(True)
    # prefer safetensors when present (`pretrained.py:872-908`)
    for safe_name in _safe_alternatives(filename):
        try:
            return hf_hub_download(
                repo_id=model_id, filename=safe_name, revision=revision, cache_dir=cache_dir
            )
        except Exception:
            pass
    return hf_hub_download(
        repo_id=model_id, filename=filename, revision=revision, cache_dir=cache_dir
    )


def download_pretrained(
    cfg: Dict, cache_dir: Optional[str] = None, prefer_hf_hub: bool = True
) -> str:
    """Resolve a pretrained cfg to a local checkpoint path
    (`pretrained.py:911-945`)."""
    target = ""
    url = cfg.get("url", "")
    hf_hub_id = cfg.get("hf_hub", "")
    if url and (not prefer_hf_hub or not hf_hub_id):
        target = download_pretrained_from_url(url, cache_dir=cache_dir)
    elif hf_hub_id:
        # hub id may include filename after '/'
        model_id, _, fname = hf_hub_id.rstrip("/").partition("/")
        if "/" in hf_hub_id.rstrip("/"):
            model_id = hf_hub_id.rstrip("/")
            fname = ""
            if model_id.count("/") > 1:
                model_id, fname = model_id.rsplit("/", 1)
        target = (
            download_pretrained_from_hf(model_id, filename=fname, cache_dir=cache_dir)
            if fname
            else download_pretrained_from_hf(model_id, cache_dir=cache_dir)
        )
    elif url:
        target = download_pretrained_from_url(url, cache_dir=cache_dir)
    return target
