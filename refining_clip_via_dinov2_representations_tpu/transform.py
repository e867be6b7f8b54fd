"""Image preprocessing pipelines.

Counterpart of the reference's torchvision pipelines
(`src/open_clip/transform.py`). Two paths, both producing float32 HWC arrays
normalized with the configured mean/std:

* **Host path** (this module): PIL-based, semantics matched to torchvision's
  PIL backend — `Resize(shortest, bicubic)` + `CenterCrop` for eval
  (`transform.py:372-390`), `RandomResizedCrop(scale=(0.9,1.0), bicubic)` for
  train (`transform.py:334-341`), plus `longest`/`squash` resize modes
  (`transform.py:349-368`), optional color-jitter / grayscale augs, and a
  native port of the reference's timm train branch (`use_timm=True`,
  `transform.py:310-332`: RRC honoring `ratio` + `interpolation='random'`,
  unconditional ColorJitter, RandomErasing 'pixel' mode — no timm
  dependency). torchvision on PIL images delegates to PIL's `Image.resize`,
  so using PIL directly is exact.

* **Device path** (`ops/preprocess.py`): XLA-fused batched uint8→normalized
  pipeline for training throughput (resize on the TPU, fused into the step).

Outputs are HWC (TPU-native); the reference emits CHW torch tensors — the
model boundary accepts both layouts.
"""

from __future__ import annotations

import math
import random
import numbers
import warnings
from dataclasses import asdict, dataclass
from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

import numpy as np
from PIL import Image, ImageOps

from .constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD


@dataclass
class PreprocessCfg:
    """(`transform.py:16-35`)"""

    size: Union[int, Tuple[int, int]] = 224
    mode: str = "RGB"
    mean: Tuple[float, ...] = OPENAI_DATASET_MEAN
    std: Tuple[float, ...] = OPENAI_DATASET_STD
    interpolation: str = "bicubic"
    resize_mode: str = "shortest"
    fill_color: int = 0

    def __post_init__(self):
        assert self.mode in ("RGB",)

    @property
    def num_channels(self):
        return 3

    @property
    def input_size(self):
        s = self.size if isinstance(self.size, (tuple, list)) else (self.size, self.size)
        return (self.num_channels,) + tuple(s)


_PREPROCESS_KEYS = set(asdict(PreprocessCfg()).keys())


def merge_preprocess_dict(base, overlay: Dict):
    """(`transform.py:40-54`)"""
    base_clean = asdict(base) if isinstance(base, PreprocessCfg) else {
        k: v for k, v in base.items() if k in _PREPROCESS_KEYS
    }
    if overlay:
        base_clean.update(
            {k: v for k, v in overlay.items() if k in _PREPROCESS_KEYS and v is not None}
        )
    return base_clean


def merge_preprocess_kwargs(base: PreprocessCfg, **kwargs):
    return merge_preprocess_dict(base, kwargs)


@dataclass
class AugmentationCfg:
    """(`transform.py:61-72`)"""

    scale: Tuple[float, float] = (0.9, 1.0)
    ratio: Optional[Tuple[float, float]] = None
    color_jitter: Optional[Any] = None
    re_prob: Optional[float] = None
    re_count: Optional[int] = None
    use_timm: bool = False
    color_jitter_prob: Optional[float] = None
    gray_scale_prob: Optional[float] = None


_PIL_INTERP = {
    "bicubic": Image.BICUBIC,
    "bilinear": Image.BILINEAR,
    "nearest": Image.NEAREST,
}


def _to_2tuple(size):
    if isinstance(size, numbers.Number):
        return int(size), int(size)
    if isinstance(size, Sequence) and len(size) == 1:
        return int(size[0]), int(size[0])
    return tuple(int(s) for s in size)


def _convert_to_rgb(img: Image.Image) -> Image.Image:
    return img.convert("RGB")


def resize_shortest(img: Image.Image, size: int, interp) -> Image.Image:
    """torchvision `Resize(int)` semantics: shortest edge → size."""
    w, h = img.size
    if (w <= h and w == size) or (h <= w and h == size):
        return img
    if w < h:
        return img.resize((size, max(1, int(round(size * h / w)))), interp)
    return img.resize((max(1, int(round(size * w / h))), size), interp)


def center_crop(img: Image.Image, size: Tuple[int, int]) -> Image.Image:
    """torchvision `CenterCrop` semantics incl. pad-when-smaller."""
    th, tw = size
    w, h = img.size
    if w < tw or h < th:
        pl = max(0, (tw - w) // 2)
        pt = max(0, (th - h) // 2)
        pr = max(0, tw - w - pl)
        pb = max(0, th - h - pt)
        img = ImageOps.expand(img, border=(pl, pt, pr, pb), fill=0)
        w, h = img.size
    left = int(round((w - tw) / 2.0))
    top = int(round((h - th) / 2.0))
    return img.crop((left, top, left + tw, top + th))


def center_crop_or_pad(img: Image.Image, size: Tuple[int, int], fill: int = 0) -> Image.Image:
    """`CenterCropOrPad` (`transform.py:207-235`): crop or pad to target."""
    th, tw = size
    w, h = img.size
    pl = max(0, (tw - w) // 2)
    pt = max(0, (th - h) // 2)
    pr = max(0, tw - w - pl)
    pb = max(0, th - h - pt)
    if any(v > 0 for v in (pl, pt, pr, pb)):
        img = ImageOps.expand(img, border=(pl, pt, pr, pb), fill=fill)
        w, h = img.size
    left = int(round((w - tw) / 2.0))
    top = int(round((h - th) / 2.0))
    return img.crop((left, top, left + tw, top + th))


def resize_keep_ratio(img: Image.Image, size: Tuple[int, int], interp, longest: float = 0.0) -> Image.Image:
    """`ResizeKeepRatio` (`transform.py:88-164`): scale by an interpolation
    between shortest-edge (longest=0) and longest-edge (longest=1) ratio."""
    w, h = img.size
    th, tw = size
    ratio_h, ratio_w = h / th, w / tw
    ratio = max(ratio_h, ratio_w) * longest + min(ratio_h, ratio_w) * (1.0 - longest)
    return img.resize((max(1, int(round(w / ratio))), max(1, int(round(h / ratio)))), interp)


def random_resized_crop(
    img: Image.Image,
    size: Tuple[int, int],
    scale: Tuple[float, float],
    ratio: Tuple[float, float],
    interp,
    rng: random.Random,
) -> Image.Image:
    """torchvision `RandomResizedCrop.get_params` algorithm: 10 attempts of
    (area-scale, log-uniform aspect) sampling, center-crop fallback."""
    w, h = img.size
    area = w * h
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            left = rng.randint(0, w - cw)
            top = rng.randint(0, h - ch)
            return img.resize(size[::-1], interp, box=(left, top, left + cw, top + ch))
    # fallback: largest center crop within ratio bounds
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    left = (w - cw) // 2
    top = (h - ch) // 2
    return img.resize(size[::-1], interp, box=(left, top, left + cw, top + ch))


def _finalize(img: Image.Image, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return (arr - mean) / std


class ImageTransform:
    """A picklable preprocessing callable: PIL.Image | ndarray → HWC float32.

    Transforms that tolerate DCT-prescaled decode (the raw-uint8 device-
    preprocess host path) set `decode_min_dim` to their staging size; the
    dataset loaders then route file/tar bytes through `apply_bytes`, which
    uses the native libjpeg core (`native.decode_jpeg`) to decode JPEGs at
    the smallest M/8 scale covering that size — ~2-5x less host decode work
    — and falls back to PIL for everything else.
    """

    def __init__(self, fn: Callable[[Image.Image], np.ndarray], image_size, is_train: bool):
        self._fn = fn
        self.image_size = image_size
        self.is_train = is_train
        self.decode_min_dim: Optional[int] = None

    def __call__(self, img) -> np.ndarray:
        if isinstance(img, np.ndarray):
            img = Image.fromarray(img)
        return self._fn(img)

    def apply_bytes(self, data: bytes) -> np.ndarray:
        """Decode encoded image bytes and apply the transform. JPEGs take the
        native DCT-scaled fast path when `decode_min_dim` is set."""
        if self.decode_min_dim is not None:
            from .native import decode_jpeg

            arr = decode_jpeg(data, self.decode_min_dim)
            if arr is not None:
                return self._fn(Image.fromarray(arr))
        import io

        with Image.open(io.BytesIO(data)) as img:
            return self._fn(img.convert("RGB"))

    def load_and_apply(self, path: str) -> np.ndarray:
        """Open `path` and apply the transform (fast JPEG path when enabled)."""
        if self.decode_min_dim is not None:
            with open(path, "rb") as f:
                return self.apply_bytes(f.read())
        with Image.open(path) as img:
            return self._fn(img.convert("RGB"))


def image_transform(
    image_size: Union[int, Tuple[int, int]],
    is_train: bool,
    mean: Optional[Tuple[float, ...]] = None,
    std: Optional[Tuple[float, ...]] = None,
    resize_mode: Optional[str] = None,
    interpolation: Optional[str] = None,
    fill_color: int = 0,
    aug_cfg: Optional[Union[Dict[str, Any], AugmentationCfg]] = None,
    seed: Optional[int] = None,
) -> ImageTransform:
    """Build the train/eval pipeline (`transform.py:274-390`)."""
    mean = tuple(mean or OPENAI_DATASET_MEAN)
    std = tuple(std or OPENAI_DATASET_STD)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)

    interpolation = interpolation or "bicubic"
    assert interpolation in ("bicubic", "bilinear", "random")
    interp = _PIL_INTERP["bilinear" if interpolation == "bilinear" else "bicubic"]

    resize_mode = resize_mode or "shortest"
    assert resize_mode in ("shortest", "longest", "squash")

    if isinstance(aug_cfg, dict):
        aug_cfg = AugmentationCfg(**aug_cfg)
    else:
        aug_cfg = aug_cfg or AugmentationCfg()

    size = _to_2tuple(image_size)

    if is_train:
        rng = random.Random(seed)
        scale = tuple(aug_cfg.scale)
        ratio = tuple(aug_cfg.ratio) if aug_cfg.ratio else (3.0 / 4.0, 4.0 / 3.0)
        cj = aug_cfg.color_jitter

        if aug_cfg.use_timm:
            # Native port of the reference's timm branch
            # (`transform.py:310-332` -> timm.data.create_transform with
            # is_training=True, hflip=0, re_mode='pixel'): RRC honoring
            # `ratio` and interpolation='random' (bilinear|bicubic per
            # image), ColorJitter applied unconditionally when set (timm
            # semantics — no probability; scalar means b=c=s, no hue),
            # normalize, then timm RandomErasing('pixel': per-pixel standard
            # normal noise on the normalized array, `re_count` = max_count).
            np_rng = np.random.default_rng(seed)
            re_prob = float(aug_cfg.re_prob or 0.0)
            re_count = int(aug_cfg.re_count or 1)
            if cj is not None and isinstance(cj, (int, float)):
                cj = (float(cj),) * 3  # timm scalar: b/c/s jitter, no hue

            def _train(img: Image.Image) -> np.ndarray:
                itp = (
                    _PIL_INTERP[rng.choice(("bilinear", "bicubic"))]
                    if interpolation == "random" else interp
                )
                img = random_resized_crop(img, size, scale, ratio, itp, rng)
                img = img.convert("RGB")
                if cj is not None:
                    img = _apply_color_jitter(img, cj, rng)
                arr = _finalize(img, mean_a, std_a)
                if re_prob:
                    arr = _random_erasing(arr, re_prob, re_count, rng, np_rng)
                return arr

            return ImageTransform(_train, size, is_train=True)

        # default branch: the reference hardcodes BICUBIC for the train RRC
        # and ignores `ratio`/`re_prob`/`re_count` with a warning
        # (`transform.py:335-341,357-358`)
        unused = {
            k: getattr(aug_cfg, k)
            for k in ("ratio", "re_prob", "re_count")
            if getattr(aug_cfg, k) is not None
        }
        if unused:
            warnings.warn(
                "Unused augmentation cfg items, specify `use_timm` to use "
                f"({list(unused.keys())})."
            )
        ratio = (3.0 / 4.0, 4.0 / 3.0)
        rrc_interp = _PIL_INTERP["bicubic"]
        cj_prob = aug_cfg.color_jitter_prob
        gs_prob = aug_cfg.gray_scale_prob

        def _train(img: Image.Image) -> np.ndarray:
            img = random_resized_crop(img, size, scale, ratio, rrc_interp, rng)
            img = img.convert("RGB")
            if cj_prob and cj is not None:
                if rng.random() < cj_prob:
                    img = _apply_color_jitter(img, cj, rng)
            if gs_prob and rng.random() < gs_prob:
                img = img.convert("L").convert("RGB")
            return _finalize(img, mean_a, std_a)

        return ImageTransform(_train, size, is_train=True)

    # ---- eval ----
    if resize_mode == "longest":
        def _eval(img: Image.Image) -> np.ndarray:
            img = resize_keep_ratio(img, size, interp, longest=1.0)
            img = center_crop_or_pad(img, size, fill=fill_color)
            return _finalize(img, mean_a, std_a)
    elif resize_mode == "squash":
        def _eval(img: Image.Image) -> np.ndarray:
            img = img.resize(size[::-1], interp)
            return _finalize(img, mean_a, std_a)
    else:
        def _eval(img: Image.Image) -> np.ndarray:
            if size[0] == size[1]:
                img = resize_shortest(img, size[0], interp)
            else:
                img = resize_keep_ratio(img, size, interp, longest=0.0)
            img = center_crop(img, size)
            return _finalize(img, mean_a, std_a)

    return ImageTransform(_eval, size, is_train=False)


def raw_uint8_transform(raw_size: int = 256) -> ImageTransform:
    """Host side of the device-preprocess path (`--device-preprocess`).

    Decode only: shortest-edge resize to `raw_size` + center crop, returned
    as uint8 HWC. The expensive work (RandomResizedCrop / normalize) runs
    on-device, XLA-fused into the train step (ops/preprocess.py), so the
    host pipeline stops being the bottleneck. `raw_size` > model input size
    keeps crop headroom for the device-side RRC.
    """
    size = (raw_size, raw_size)
    interp = _PIL_INTERP["bicubic"]

    def _raw(img: Image.Image) -> np.ndarray:
        img = resize_shortest(img.convert("RGB"), raw_size, interp)
        img = center_crop(img, size)
        return np.asarray(img, dtype=np.uint8)

    t = ImageTransform(_raw, size, is_train=True)
    t.is_raw_uint8 = True
    # JPEGs may decode at the smallest M/8 DCT scale covering raw_size (the
    # final bicubic + crop still run): this path already trades bit-exactness
    # for throughput, and the device-side RRC consumes the result.
    t.decode_min_dim = raw_size
    return t


def _apply_color_jitter(img: Image.Image, cj, rng: random.Random) -> Image.Image:
    """Brightness/contrast/saturation/hue jitter (simclr-style,
    `transform.py:238-257`)."""
    from PIL import ImageEnhance

    if isinstance(cj, (int, float)):
        cj = (cj, cj, cj, 0.0)
    b, c, s, h = (list(cj) + [0.0] * 4)[:4]
    ops = []
    if b:
        ops.append(lambda im: ImageEnhance.Brightness(im).enhance(rng.uniform(max(0, 1 - b), 1 + b)))
    if c:
        ops.append(lambda im: ImageEnhance.Contrast(im).enhance(rng.uniform(max(0, 1 - c), 1 + c)))
    if s:
        ops.append(lambda im: ImageEnhance.Color(im).enhance(rng.uniform(max(0, 1 - s), 1 + s)))
    rng.shuffle(ops)
    for op in ops:
        img = op(img)
    if h:
        hsv = np.asarray(img.convert("HSV"), dtype=np.int16)
        shift = int(rng.uniform(-h, h) * 255)
        hsv[..., 0] = (hsv[..., 0] + shift) % 256
        img = Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")
    return img


def _random_erasing(
    arr: np.ndarray,
    prob: float,
    max_count: int,
    rng: random.Random,
    np_rng: np.random.Generator,
) -> np.ndarray:
    """timm `RandomErasing` (mode='pixel') on a normalized HWC array:
    with probability `prob`, erase 1..`max_count` rectangles, each covering
    uniform(0.02, 1/3)/count of the image area at a log-uniform aspect in
    [0.3, 1/0.3], filled with per-pixel standard-normal noise (the timm
    'pixel' fill on the already-normalized tensor)."""
    if rng.random() > prob:
        return arr
    h_img, w_img = arr.shape[:2]
    area = float(h_img * w_img)
    count = max_count if max_count <= 1 else rng.randint(1, max_count)
    log_aspect = (math.log(0.3), math.log(1.0 / 0.3))
    out = arr.copy()
    for _ in range(count):
        for _attempt in range(10):
            target_area = rng.uniform(0.02, 1.0 / 3.0) * area / count
            aspect = math.exp(rng.uniform(*log_aspect))
            eh = int(round(math.sqrt(target_area * aspect)))
            ew = int(round(math.sqrt(target_area / aspect)))
            if 0 < ew < w_img and 0 < eh < h_img:
                top = rng.randint(0, h_img - eh)
                left = rng.randint(0, w_img - ew)
                out[top:top + eh, left:left + ew, :] = np_rng.normal(
                    size=(eh, ew, out.shape[2])
                ).astype(out.dtype)
                break
    return out


def image_transform_v2(
    cfg: PreprocessCfg,
    is_train: bool,
    aug_cfg: Optional[Union[Dict[str, Any], AugmentationCfg]] = None,
) -> ImageTransform:
    """(`transform.py:393-407`)"""
    t = image_transform(
        image_size=cfg.size,
        is_train=is_train,
        mean=cfg.mean,
        std=cfg.std,
        interpolation=cfg.interpolation,
        resize_mode=cfg.resize_mode,
        fill_color=cfg.fill_color,
        aug_cfg=aug_cfg,
    )
    # expose the resolved normalization so callers (e.g. --device-preprocess)
    # can replicate it on-device
    t.mean = tuple(cfg.mean or OPENAI_DATASET_MEAN)
    t.std = tuple(cfg.std or OPENAI_DATASET_STD)
    return t
