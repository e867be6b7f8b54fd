"""Input pipeline: CSV / synthetic / ImageNet datasets + DINO feature store.

TPU-native re-design of `src/open_clip_train/data.py`. Differences from the
torch DataLoader world:

* loaders yield **numpy batch dicts** sized for the *global* batch; the train
  loop shards them over the mesh (`parallel.shard_batch`) — there is no
  per-GPU DataLoader+DistributedSampler pair. Multi-host runs shard by
  `jax.process_index()` inside the sampler.
* image decode runs in a thread pool (PIL releases the GIL for JPEG work);
  batches are prefetched on a background thread so host input overlaps device
  compute.
* the precomputed DINO teacher tensor becomes a **memory-mapped fp32 .npy**
  (converted once from the reference's `.pt`) gathered per batch on host —
  the analogue of the reference's pinned-CPU tensor + per-batch
  `index_select` (`main.py:692-707`, `train.py:271-280`).

Validation behaviours reproduced exactly: canonical-path normalization
(`data.py:46-51`), CSV↔DINO-map alignment errors with basename hints
(`data.py:120-153`), 5-consecutive-caption grouping check (`data.py:156-172`),
per-batch index-range assertion (`train.py:249-266`).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np
from PIL import Image


def _canon_path(p: str) -> str:
    """(`data.py:46-51`)"""
    p = os.path.realpath(str(p))
    p = os.path.normpath(p)
    root, ext = os.path.splitext(p)
    return root + ext.lower()


# ---------------------------------------------------------------------------
# DINO teacher feature store
# ---------------------------------------------------------------------------

class DinoFeatureStore:
    """Precomputed DINOv2 features with O(1) host gather.

    Accepts the reference's `.pt` tensor (`--dino_fts_path`), `.npy`, `.npz`
    (key 'feats' or first array) or `.safetensors`. Torch inputs are converted
    once to `<path>.npy` next to the source and memory-mapped thereafter.
    """

    def __init__(self, path: str, mmap: bool = True):
        self.path = str(path)
        arr = self._load(self.path, mmap)
        assert arr.ndim == 2, f"DINO features must be [N, D], got {arr.shape}"
        self.features = arr

    @staticmethod
    def _load(path: str, mmap: bool) -> np.ndarray:
        if path.endswith(".npy"):
            return np.load(path, mmap_mode="r" if mmap else None)
        if path.endswith(".npz"):
            z = np.load(path)
            key = "feats" if "feats" in z else list(z.keys())[0]
            return np.asarray(z[key], np.float32)
        if path.endswith(".safetensors"):
            from safetensors.numpy import load_file

            d = load_file(path)
            key = "feats" if "feats" in d else list(d.keys())[0]
            return np.asarray(d[key], np.float32)
        # torch .pt: convert once to sidecar .npy then mmap
        cache = path + ".npy"
        if not os.path.exists(cache):
            import torch

            t = torch.load(path, map_location="cpu", weights_only=False)
            if isinstance(t, dict):
                t = t.get("feats", next(iter(t.values())))
            arr = t.float().numpy() if hasattr(t, "float") else np.asarray(t, np.float32)
            np.save(cache, arr.astype(np.float32))
            logging.info("[DINO] converted %s -> %s %s", path, cache, arr.shape)
        return np.load(cache, mmap_mode="r" if mmap else None)

    @property
    def shape(self):
        return self.features.shape

    def take(self, indices: np.ndarray) -> np.ndarray:
        """Per-batch gather with the reference's range validation
        (`train.py:249-266`)."""
        indices = np.asarray(indices, np.int64)
        n = self.features.shape[0]
        if indices.size and (indices.min() < 0 or indices.max() >= n):
            bad = indices[(indices < 0) | (indices >= n)][:10].tolist()
            raise ValueError(
                f"[DINO] Out-of-range indices: min={indices.min()}, max={indices.max()}, "
                f"feats_rows={n}. Examples of bad indices: {bad}. This usually means "
                "your dino_index_map does not align with the training CSV order OR "
                "contains placeholder -1 entries."
            )
        return np.asarray(self.features[indices], np.float32)


def load_dino_index_map(path: str) -> Dict[str, int]:
    """Load a path→row-index map; `.pt` dict, `.json`, or `.npz`
    (`main.py:711-741` semantics incl. the `path_to_index` wrapper)."""
    if path.endswith(".json"):
        with open(path) as f:
            raw = json.load(f)
    elif path.endswith(".npz"):
        z = np.load(path, allow_pickle=True)
        raw = z["map"].item() if "map" in z else z[list(z.keys())[0]].item()
    else:
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "path_to_index" in raw:
        raw = raw["path_to_index"]
    return {str(k): int(v) for k, v in raw.items()}


# ---------------------------------------------------------------------------
# Datasets
# ---------------------------------------------------------------------------

class CsvDataset:
    """CSV of (image path, caption) rows (`data.py:66-195`).

    Modes:
      train + dino_index_map → sample dict has `dino_idx`
      eval (return_image_id) → sample dict has `image_path`
    """

    def __init__(
        self,
        input_filename: str,
        transforms: Callable,
        img_key: str,
        caption_key: str,
        sep: str = ",",
        tokenizer=None,
        return_image_id: bool = False,
        dino_index_map: Optional[Dict[str, int]] = None,
    ):
        import pandas as pd

        logging.debug("Loading csv data from %s.", input_filename)
        df = pd.read_csv(input_filename, sep=sep)
        df[img_key] = df[img_key].apply(_canon_path)

        self.images: List[str] = df[img_key].tolist()
        self.captions: List[str] = [str(c) for c in df[caption_key].tolist()]
        self.transforms = transforms
        self.tokenize = tokenizer
        self.return_image_id = bool(return_image_id)

        self.dino_index_map = None
        if dino_index_map:
            base = dino_index_map.get("path_to_index", dino_index_map) if isinstance(
                dino_index_map, dict
            ) else dino_index_map
            self.dino_index_map = {_canon_path(k): int(v) for k, v in base.items()}
            self._validate_dino_map()

        if self.return_image_id:
            import pandas as pd

            # LOCAL factorize only for the ordering sanity check — retrieval
            # ids are rebuilt first-occurrence from image_path in evaluate()
            # (`train.py:624-647`); storing a second, differently-ordered id
            # scheme invites someone to wire the wrong one into metrics
            ids, _ = pd.factorize(df[img_key], sort=True)
            self._debug_consecutive_ordering(ids.astype(int).tolist())

    def _validate_dino_map(self):
        """Actionable CSV↔map mismatch error (`data.py:120-153`)."""
        csv_set = set(self.images)
        map_set = set(self.dino_index_map.keys())
        missing = [p for p in self.images if p not in self.dino_index_map]
        negvals = [p for p in self.images if self.dino_index_map.get(p, -1) < 0]
        if missing or negvals:
            msg = ["[DINO] CSV ↔ DINO map mismatch/invalid values."]
            msg.append(
                f"  CSV rows: {len(self.images)} | Unique CSV paths: {len(csv_set)} | "
                f"Map keys: {len(map_set)}"
            )
            if missing:
                msg.append("  Missing in map (first 10):")
                msg += [f"    {s}" for s in missing[:10]]
            if negvals:
                msg.append("  Keys with -1 index (first 10):")
                msg += [f"    {s}" for s in negvals[:10]]
            csv_b = {os.path.basename(p) for p in csv_set}
            map_b = {os.path.basename(p) for p in map_set}
            msg.append("  Basename-only diff (hints):")
            msg.append(f"    Only in CSV (first 10): {sorted(csv_b - map_b)[:10]}")
            msg.append(f"    Only in MAP (first 10): {sorted(map_b - csv_b)[:10]}")
            msg.append(
                "Tip: Rebuild the DINO map from the SAME CSV, using the SAME _canon_path()."
            )
            raise RuntimeError("\n".join(msg))

    def _debug_consecutive_ordering(self, image_ids):
        """5-consecutive-caption grouping sanity check (`data.py:156-172`)."""
        ok = broken = 0
        for idx in range(0, min(100, len(image_ids)), 5):
            if idx + 4 >= len(image_ids):
                break
            group = image_ids[idx : idx + 5]
            if len(set(group)) == 1:
                ok += 1
            else:
                broken += 1
                if broken <= 3:
                    logging.warning("Broken group at index %d: %s", idx, group)
        logging.info("Consecutive ordering: %d OK groups, %d broken groups", ok, broken)

    def __len__(self):
        return len(self.captions)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        path = self.images[idx]
        if getattr(self.transforms, "decode_min_dim", None) is not None:
            # raw-uint8 host path: native DCT-scaled JPEG decode (PIL
            # fallback inside) — see transform.ImageTransform.load_and_apply
            image = self.transforms.load_and_apply(path)
        else:
            with Image.open(path) as img:
                image = self.transforms(img.convert("RGB"))
        sample: Dict[str, Any] = {
            "images": image,
            "texts": self.tokenize([self.captions[idx]])[0]
            if self.tokenize
            else self.captions[idx],
        }
        if self.dino_index_map is not None and not self.return_image_id:
            sample["dino_idx"] = np.int64(self.dino_index_map.get(path, -1))
        if self.return_image_id:
            sample["image_path"] = path
        return sample


class SyntheticDataset:
    """Blank image + constant caption (`data.py:694-745`) — the built-in
    fake-data backend used by end-to-end CPU tests and throughput benches."""

    def __init__(
        self,
        transform=None,
        image_size=(224, 224),
        caption: str = "Dummy caption",
        dataset_size: int = 100,
        tokenizer=None,
        dino_dim: Optional[int] = None,
    ):
        self.transform = transform
        self.image_size = image_size
        self.caption = caption
        self.dataset_size = dataset_size
        self.tokenize = tokenizer
        self.dino_dim = dino_dim
        img = Image.new("RGB", tuple(image_size))
        self._image = (
            self.transform(img)
            if self.transform
            else np.zeros((*image_size, 3), np.float32)
        )
        self._text = (
            self.tokenize([self.caption])[0] if self.tokenize else self.caption
        )

    def __len__(self):
        return self.dataset_size

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        sample = {"images": self._image, "texts": self._text}
        if self.dino_dim:
            rng = np.random.default_rng(idx)
            sample["dino_features"] = rng.normal(size=(self.dino_dim,)).astype(np.float32)
        return sample


class ImageFolderDataset:
    """Minimal ImageFolder (class-per-subdir) for ImageNet zero-shot eval
    (replaces torchvision.datasets.ImageFolder, `data.py:266-310`)."""

    def __init__(self, root: str, transform=None):
        self.root = root
        self.transform = transform
        classes = [
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        ]
        if classes and all(c.isdigit() for c in classes):
            # ImageNet-V2 layout: dirs named 0..999 ARE the class indices.
            # A lexicographic sort would map '10'->2 and scramble nearly
            # every zero-shot label (the reference's ImageNetV2Dataset does
            # int(folder)); numeric sort keeps folder N == classifier row N.
            classes = sorted(classes, key=int)
            self.class_to_idx = {c: int(c) for c in classes}
        else:
            classes = sorted(classes)
            self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List[tuple] = []
        exts = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
        for c in classes:
            cdir = os.path.join(root, c)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith(exts):
                    self.samples.append((os.path.join(cdir, fn), self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        path, label = self.samples[idx]
        with Image.open(path) as img:
            image = self.transform(img.convert("RGB")) if self.transform else np.asarray(img)
        return {"images": image, "labels": np.int64(label)}


# ---------------------------------------------------------------------------
# Loader: shuffle / shard / batch / prefetch
# ---------------------------------------------------------------------------

def _collate(samples: Sequence[Dict[str, Any]]) -> Dict[str, np.ndarray]:
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], str):
            out[key] = vals
        else:
            out[key] = np.stack([np.asarray(v) for v in vals])
    return out


class Loader:
    """Epoch-seeded shuffling, multi-host sharding, threaded decode, and
    background prefetch. Yields numpy batch dicts."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
        dino_store: Optional[DinoFeatureStore] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.dino_store = dino_store
        self.epoch = 0
        self._skip_batches = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def skip_next_batches(self, n: int):
        """Mid-epoch resume: the next __iter__ starts at batch `n` of this
        epoch's (deterministic, epoch-seeded) order. Index-level skip — no
        decode work for the consumed prefix. One-shot: consumed by the next
        iteration."""
        self._skip_batches = int(n)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # contiguous shard per host (equal sizes; trailing remainder dropped
        # so every host steps in lockstep — required for collectives)
        per_host = n // self.process_count
        start = self.process_index * per_host
        return idx[start : start + per_host]

    def __len__(self):
        per_host = len(self.dataset) // self.process_count
        if self.drop_last:
            return per_host // self.batch_size
        return (per_host + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._indices()
        nb = len(indices) // self.batch_size
        rem = len(indices) % self.batch_size
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)
        ]
        if rem and not self.drop_last:
            batches.append(indices[nb * self.batch_size :])
        skip, self._skip_batches = self._skip_batches, 0
        if skip:
            batches = batches[skip:]

        pool = ThreadPoolExecutor(self.num_workers)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def fetch_batch(batch_idx: np.ndarray) -> Dict[str, np.ndarray]:
            samples = list(pool.map(self.dataset.__getitem__, batch_idx))
            batch = _collate(samples)
            if self.dino_store is not None and "dino_idx" in batch:
                batch["dino_features"] = self.dino_store.take(batch.pop("dino_idx"))
            return batch

        abandoned = threading.Event()

        def put(item) -> bool:
            """Bounded put that gives up when the consumer abandoned
            iteration — without this, an exception in the train step (or an
            early-exiting eval) leaves the producer parked in q.put() on a
            full queue forever, pinning a decoded global batch per leaked
            daemon thread."""
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in batches:
                    if not put(fetch_batch(b)):
                        return
            except Exception as e:  # surface loader errors to the consumer
                put(e)
            finally:
                put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            abandoned.set()
            pool.shutdown(wait=False)


@dataclasses.dataclass
class DataInfo:
    """(`data.py:208-218`)"""

    dataloader: Any
    sampler: Any = None

    def set_epoch(self, epoch: int):
        if hasattr(self.dataloader, "set_epoch"):
            self.dataloader.set_epoch(epoch)


# ---------------------------------------------------------------------------
# get_data — assemble the dataset dict (`data.py:748-829`)
# ---------------------------------------------------------------------------

def get_dataset_fn(data_path: Optional[str], dataset_type: str):
    if dataset_type == "csv":
        return get_csv_dataset
    if dataset_type == "synthetic":
        return get_synthetic_dataset
    if dataset_type == "webdataset":
        from .webdataset import get_wds_dataset

        return get_wds_dataset
    if dataset_type == "auto":
        ext = (data_path or "").split(".")[-1]
        if ext in ("csv", "tsv"):
            return get_csv_dataset
        if ext in ("tar",):
            from .webdataset import get_wds_dataset

            return get_wds_dataset
        raise ValueError(f"Tried to figure out dataset type, but failed for extension {ext}.")
    raise ValueError(f"Unsupported dataset type: {dataset_type}")


def _loader_kwargs(args, is_train: bool) -> Dict[str, Any]:
    import jax

    return dict(
        # --batch-size is per data-parallel rank (reference per-GPU parity);
        # each host loads its slice of the batch_size x data_ranks global
        # batch. main.py precomputes per_host_batch_size; library callers
        # that bypass main() fall back to treating it as the host batch.
        batch_size=getattr(args, "per_host_batch_size", None) or args.batch_size,
        num_workers=getattr(args, "workers", 8),
        # host-sharding applies to TRAIN loaders only: the reference
        # evaluates the FULL val set on the master rank (`train.py:593-595`
        # + unsharded val DataLoader) — sharding val would shrink the
        # retrieval gallery by process_count and inflate R@K
        process_index=jax.process_index() if is_train else 0,
        process_count=jax.process_count() if is_train else 1,
        seed=getattr(args, "seed", 0),
        shuffle=is_train,
        drop_last=is_train,
    )


def get_csv_dataset(args, preprocess_fn, is_train: bool, tokenizer=None, dino_index_map=None):
    input_filename = args.train_data if is_train else args.val_data
    assert input_filename
    dino_store = None
    if is_train and getattr(args, "use_dino_general", False) and getattr(args, "dino_fts_path", None):
        dino_store = DinoFeatureStore(args.dino_fts_path)
    dataset = CsvDataset(
        input_filename,
        preprocess_fn,
        img_key=args.csv_img_key,
        caption_key=args.csv_caption_key,
        sep=args.csv_separator,
        tokenizer=tokenizer,
        return_image_id=not is_train,
        dino_index_map=dino_index_map if is_train else None,
    )
    loader = Loader(dataset, dino_store=dino_store, **_loader_kwargs(args, is_train))
    loader.num_samples = len(dataset)
    loader.num_batches = len(loader)
    return DataInfo(loader)


def get_synthetic_dataset(args, preprocess_fn, is_train: bool, tokenizer=None, dino_index_map=None):
    image_size = preprocess_fn.image_size if hasattr(preprocess_fn, "image_size") else (224, 224)
    n = (
        args.train_num_samples
        if is_train
        else (getattr(args, "val_num_samples", None) or args.train_num_samples or 256)
    )
    dataset = SyntheticDataset(
        transform=preprocess_fn,
        image_size=image_size,
        dataset_size=n or 256,
        tokenizer=tokenizer,
        dino_dim=getattr(args, "synthetic_dino_dim", None)
        if (is_train and getattr(args, "use_dino_general", False))
        else None,
    )
    loader = Loader(dataset, **_loader_kwargs(args, is_train))
    loader.num_samples = len(dataset)
    loader.num_batches = len(loader)
    return DataInfo(loader)


class _SubsetDataset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]


def get_imagenet(args, preprocess_fns, split: str):
    """(`data.py:266-310`) — ImageNet train/val/v2 folders. 'train' draws the
    reference's 50-shot-per-class random subset; 'v2' points the same folder
    reader at the imagenet-v2 directory."""
    assert split in ("train", "val", "v2")
    preprocess_train, preprocess_val = preprocess_fns
    is_train = split == "train"
    root = {
        "train": getattr(args, "imagenet_train", None),
        "val": args.imagenet_val,
        "v2": args.imagenet_v2,
    }[split]
    assert root, f"no path configured for imagenet split {split}"
    dataset = ImageFolderDataset(
        root, transform=preprocess_train if is_train else preprocess_val
    )
    if is_train:
        # k-shot subsample: 50 random images per class (`data.py:286-299`)
        k = 50
        targets = np.asarray([lbl for _, lbl in dataset.samples])
        rng = np.random.default_rng(getattr(args, "seed", 0))
        keep = []
        for c in np.unique(targets):
            idxs = np.where(targets == c)[0]
            rng.shuffle(idxs)
            keep.extend(idxs[:k].tolist())
        dataset = _SubsetDataset(dataset, sorted(keep))
    loader = Loader(
        dataset,
        batch_size=args.batch_size,
        num_workers=getattr(args, "workers", 8),
        shuffle=is_train,
    )
    loader.num_samples = len(dataset)
    loader.num_batches = len(loader)
    return DataInfo(loader)


def get_data(args, preprocess_fns, epoch: int = 0, tokenizer=None, dino_index_map=None):
    """Assemble the dataset dict with the reference's keys (`data.py:787-829`)."""
    preprocess_train, preprocess_val = preprocess_fns
    data: Dict[str, DataInfo] = {}

    if args.train_data or args.dataset_type == "synthetic":
        data["train"] = get_dataset_fn(args.train_data, args.dataset_type)(
            args, preprocess_train, is_train=True, tokenizer=tokenizer,
            dino_index_map=dino_index_map,
        )

    if args.val_data:
        data["val"] = get_dataset_fn(args.val_data, args.dataset_type)(
            args, preprocess_val, is_train=False, tokenizer=tokenizer
        )

    for key, attr in (
        ("flickr30k-val", "flickr_val_data"),
        ("mscoco-val", "mscoco_val_data"),
    ):
        path = getattr(args, attr, None)
        if path:
            sub_args = _clone_args(args, val_data=path)
            data[key] = get_csv_dataset(
                sub_args, preprocess_val, is_train=False, tokenizer=tokenizer
            )

    if getattr(args, "imagenet_val", None):
        data["imagenet-val"] = get_imagenet(args, preprocess_fns, "val")
    if getattr(args, "imagenet_v2", None):
        data["imagenet-v2"] = get_imagenet(args, preprocess_fns, "v2")
    return data


def _clone_args(args, **overrides):
    import copy
    from types import SimpleNamespace

    d = dict(vars(args))
    d.update(overrides)
    return SimpleNamespace(**d)
