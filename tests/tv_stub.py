"""Functional torchvision stand-in for driving the REFERENCE training stack.

The image lacks torchvision; the reference's preprocessing
(`src/open_clip/transform.py:7-10`) needs working `transforms` /
`transforms.functional` implementations, not just import stubs. For PIL
inputs, real torchvision defers to PIL for the geometry (resize/crop), so a
PIL-backed implementation reproduces its semantics exactly; ToTensor /
Normalize are trivial tensor math. RandomResizedCrop samples with torch RNG
using torchvision's get_params distribution (10 tries of area-scale +
log-ratio, center-crop fallback).

Installed by `tests/ref_loader.py` only when real torchvision is absent.
No torchvision code is copied — these are clean-room implementations of the
documented behavior.
"""

from __future__ import annotations

import math
import numbers

import numpy as np
import torch
from PIL import Image


class InterpolationMode:
    NEAREST = "nearest"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"
    LANCZOS = "lanczos"

    # torchvision accepts the enum member anywhere; keep .value working
    @property
    def value(self):  # pragma: no cover - attribute-style access not used
        return self


_PIL_MODES = {
    InterpolationMode.NEAREST: Image.NEAREST,
    InterpolationMode.BILINEAR: Image.BILINEAR,
    InterpolationMode.BICUBIC: Image.BICUBIC,
    InterpolationMode.LANCZOS: Image.LANCZOS,
    "nearest": Image.NEAREST,
    "bilinear": Image.BILINEAR,
    "bicubic": Image.BICUBIC,
    "lanczos": Image.LANCZOS,
}


def _to_2tuple(size):
    if isinstance(size, numbers.Number):
        return int(size), int(size)
    if len(size) == 1:
        return int(size[0]), int(size[0])
    return int(size[0]), int(size[1])


# --------------------------------------------------------------------------
# functional
# --------------------------------------------------------------------------

def resize(img, size, interpolation=InterpolationMode.BILINEAR, **kwargs):
    mode = _PIL_MODES.get(interpolation, Image.BILINEAR)
    w, h = img.size
    if isinstance(size, numbers.Number) or (hasattr(size, "__len__") and len(size) == 1):
        short = int(size if isinstance(size, numbers.Number) else size[0])
        if (w <= h and w == short) or (h <= w and h == short):
            return img
        if w < h:
            return img.resize((short, int(short * h / w)), mode)
        return img.resize((int(short * w / h), short), mode)
    th, tw = int(size[0]), int(size[1])
    return img.resize((tw, th), mode)


def crop(img, top, left, height, width):
    return img.crop((left, top, left + width, top + height))


def pad(img, padding, fill=0, padding_mode="constant"):
    if isinstance(padding, numbers.Number):
        pl = pt = pr = pb = int(padding)
    elif len(padding) == 2:
        pl, pt = padding
        pr, pb = padding
    else:
        pl, pt, pr, pb = padding
    w, h = img.size
    out = Image.new(img.mode, (w + pl + pr, h + pt + pb),
                    tuple([fill] * len(img.getbands())) if img.getbands() else fill)
    out.paste(img, (pl, pt))
    return out


def center_crop(img, output_size):
    th, tw = _to_2tuple(output_size)
    w, h = img.size
    if w < tw or h < th:
        img = pad(img, (max(0, (tw - w) // 2), max(0, (th - h) // 2),
                        max(0, tw - w - (tw - w) // 2), max(0, th - h - (th - h) // 2)))
        w, h = img.size
    top = int(round((h - th) / 2.0))
    left = int(round((w - tw) / 2.0))
    return crop(img, top, left, th, tw)


def resized_crop(img, top, left, height, width, size,
                 interpolation=InterpolationMode.BILINEAR, **kwargs):
    return resize(crop(img, top, left, height, width), size, interpolation)


def to_tensor(img):
    if isinstance(img, torch.Tensor):
        return img
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
    return t.to(torch.float32).div_(255.0)


def normalize(tensor, mean, std, inplace=False):
    if not inplace:
        tensor = tensor.clone()
    mean = torch.as_tensor(mean, dtype=tensor.dtype).view(-1, 1, 1)
    std = torch.as_tensor(std, dtype=tensor.dtype).view(-1, 1, 1)
    return tensor.sub_(mean).div_(std)


# --------------------------------------------------------------------------
# transform classes
# --------------------------------------------------------------------------

class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img

    def __repr__(self):
        return f"Compose({self.transforms})"


class ToTensor:
    def __call__(self, img):
        return to_tensor(img)


class Normalize:
    def __init__(self, mean, std):
        self.mean, self.std = mean, std

    def __call__(self, tensor):
        return normalize(tensor, self.mean, self.std)


class Resize:
    def __init__(self, size, interpolation=InterpolationMode.BILINEAR, **kwargs):
        self.size, self.interpolation = size, interpolation

    def __call__(self, img):
        return resize(img, self.size, self.interpolation)


class CenterCrop:
    def __init__(self, size):
        self.size = size

    def __call__(self, img):
        return center_crop(img, self.size)


class RandomResizedCrop:
    def __init__(self, size, scale=(0.08, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0),
                 interpolation=InterpolationMode.BILINEAR, **kwargs):
        self.size = _to_2tuple(size)
        self.scale, self.ratio = tuple(scale), tuple(ratio)
        self.interpolation = interpolation

    @staticmethod
    def get_params(img, scale, ratio):
        w, h = img.size
        area = h * w
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        for _ in range(10):
            target_area = area * torch.empty(1).uniform_(scale[0], scale[1]).item()
            aspect = math.exp(torch.empty(1).uniform_(log_ratio[0], log_ratio[1]).item())
            tw = int(round(math.sqrt(target_area * aspect)))
            th = int(round(math.sqrt(target_area / aspect)))
            if 0 < tw <= w and 0 < th <= h:
                top = torch.randint(0, h - th + 1, size=(1,)).item()
                left = torch.randint(0, w - tw + 1, size=(1,)).item()
                return top, left, th, tw
        # center-crop fallback
        in_ratio = float(w) / float(h)
        if in_ratio < ratio[0]:
            tw, th = w, int(round(w / ratio[0]))
        elif in_ratio > ratio[1]:
            th, tw = h, int(round(h * ratio[1]))
        else:
            tw, th = w, h
        return (h - th) // 2, (w - tw) // 2, th, tw

    def __call__(self, img):
        top, left, th, tw = self.get_params(img, self.scale, self.ratio)
        return resized_crop(img, top, left, th, tw, self.size, self.interpolation)


class Grayscale:
    def __init__(self, num_output_channels=3):
        self.n = num_output_channels

    def __call__(self, img):
        g = img.convert("L")
        return g.convert("RGB") if self.n == 3 else g


class ColorJitter:
    """No-op stand-in: the dress-rehearsal runs never configure color
    jitter; constructing it must not fail, applying it must be identity."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, img):
        return img
