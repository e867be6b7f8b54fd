"""WebDataset-style tar-shard reader (no external webdataset dependency).

TPU-native rebuild of the reference's webdataset pipeline
(`src/open_clip_train/data.py:313-691`): iterate `.tar` shards of
(key.jpg, key.txt) pairs, with

* brace expansion of shard patterns (`{00000..00099}.tar`),
* deterministic epoch-seeded shard shuffling (detshuffle2 semantics,
  `data.py:410-439`),
* shard split across hosts (`split_by_node`) — here `jax.process_index` —
  and across reader threads (`split_by_worker`),
* non-throwing sample handling: decode/IO errors are logged and skipped
  (`log_and_continue` `data.py:342-345`, non-throwing tar grouping
  `data.py:348-387`),
* a sample-level shuffle buffer, then batching.

Shard resampling mode (`ResampledShards2`, `data.py:442-496`) draws shards
with replacement per epoch from a seeded RNG — used for infinite-stream
training.
"""

from __future__ import annotations

import io
import logging
import os
import random
import re
import tarfile
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np
from PIL import Image

from .data import DataInfo, _collate


_BRACE = re.compile(r"\{([^{}]+)\}")


def _expand_braces(url: str) -> List[str]:
    """Full braceexpand semantics for the subset shard patterns use: numeric
    ranges `{000..099}` (zero-padded) and comma lists `{a,b}`, applied to
    EVERY brace group (cartesian product), innermost-first for nesting."""
    m = _BRACE.search(url)
    if not m:
        return [url]
    body = m.group(1)
    if re.fullmatch(r"\d+\.\.\d+", body):
        lo, hi = body.split("..")
        width = len(lo)
        parts = [str(i).zfill(width) for i in range(int(lo), int(hi) + 1)]
    elif "," in body:
        parts = body.split(",")
    else:  # not an expansion we understand; keep literally
        return [url[: m.start()] + body + url[m.end():]]
    out: List[str] = []
    for p in parts:
        out.extend(_expand_braces(url[: m.start()] + p + url[m.end():]))
    return out


def expand_urls(urls) -> List[str]:
    """Brace expansion: 'a-{000..002}.tar' -> [a-000.tar, a-001.tar, a-002.tar].
    Accepts '::'-joined lists like the reference (`data.py:316-330`); multiple
    brace groups per URL expand like the reference's `braceexpand`."""
    if isinstance(urls, str):
        url_list = urls.split("::")
    else:
        url_list = list(urls)
    out: List[str] = []
    for url in url_list:
        out.extend(_expand_braces(url))
    return out


_IMG_EXT = {"jpg", "jpeg", "png", "webp", "bmp"}
_TXT_EXT = {"txt", "text", "caption"}
_JSON_EXT = {"json"}


# webdataset `base_plus_ext` convention: the sample key is the FULL member
# path up to the first dot of the basename (directories included, so
# `a/0001.jpg` and `b/0001.jpg` stay distinct samples); the extension is
# everything after that first dot (so `0001.en.txt` groups with `0001.jpg`
# under ext "en.txt")
_KEY_EXT = re.compile(r"^((?:.*/|)[^.]+)\.(.+)$")


def _group_tar_samples(tar_path: str) -> Iterator[Dict[str, bytes]]:
    """Group tar members by webdataset key; never raises on a bad member
    (`tarfile_to_samples_nothrow`, `data.py:348-387`)."""
    try:
        tf = tarfile.open(tar_path)
    except (OSError, tarfile.TarError) as e:
        logging.warning("Skipping unreadable shard %s (%r)", tar_path, e)
        return
    current_key = None
    sample: Dict[str, bytes] = {}
    try:
        for member in tf:
            if not member.isfile():
                continue
            m = _KEY_EXT.match(member.name)
            if not m:
                continue
            key, ext = m.group(1), m.group(2)
            if key != current_key:
                if sample and current_key is not None:
                    yield sample
                current_key = key
                sample = {"__key__": current_key.encode()}
            try:
                sample[ext.lower()] = tf.extractfile(member).read()
            except (OSError, tarfile.TarError) as e:
                logging.warning("Error reading %s from %s (%r)", member.name, tar_path, e)
        if sample and current_key is not None:
            yield sample
    finally:
        tf.close()


class WdsLoader:
    """Iterable over batches read from tar shards."""

    def __init__(
        self,
        urls,
        preprocess_img: Callable,
        tokenizer,
        batch_size: int,
        num_samples: int,
        is_train: bool = True,
        seed: int = 0,
        resampled: bool = False,
        shuffle_buffer: int = 5000,
        process_index: int = 0,
        process_count: int = 1,
        caption_key: str = "txt",
        num_workers: int = 8,
    ):
        self.shards = expand_urls(urls)
        assert self.shards, "no shards resolved"
        self.preprocess_img = preprocess_img
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.is_train = is_train
        self.seed = seed
        self.resampled = resampled
        self.shuffle_buffer = shuffle_buffer if is_train else 0
        self.process_index = process_index
        self.process_count = process_count
        self.caption_key = caption_key
        self.num_workers = max(1, num_workers)
        self.epoch = 0
        self.num_samples = num_samples
        # per-host batch count; mirror of the reference's worker-epoch sizing
        # (`data.py:589-606`): every host must emit the same number of batches.
        self.num_batches = max(1, num_samples // (batch_size * process_count))
        self._skip_batches = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def skip_next_batches(self, n: int):
        """Mid-epoch resume: the next __iter__ consumes the first
        n*batch_size RAW records (tar bytes, shuffle-buffer order — all
        deterministic per epoch) WITHOUT decoding them, then emits the
        remaining num_batches-n batches. Caveat: a sample the original run
        dropped at decode (corrupt image) counts here as consumed, so resume
        order can skew by the number of bad samples in the prefix — bad
        samples are already best-effort territory (the stream skips them
        non-fatally). One-shot."""
        self._skip_batches = int(n)

    def _epoch_shards(self, epoch: Optional[int] = None) -> List[str]:
        e = self.epoch if epoch is None else epoch
        # resampling is a TRAIN-mode behavior (reference data.py:
        # `resampled = args.dataset_resampled and is_train`); eval always
        # reads the full shard list exactly once
        if self.resampled and self.is_train:
            # per-host independent draws (reference ResampledShards2 seeds
            # per rank/worker) — without process_index every host would
            # emit an identical stream and the global batch would carry
            # duplicated rows
            rng = random.Random((self.seed + e) * 1000 + self.process_index)
            return [rng.choice(self.shards) for _ in range(len(self.shards))]
        rng = random.Random(self.seed + e)
        shards = list(self.shards)
        if self.is_train:
            rng.shuffle(shards)  # deterministic epoch-seeded (detshuffle2)
        return shards[self.process_index :: self.process_count] or shards[:1]

    def _samples(self, epoch: Optional[int] = None) -> Iterator[tuple]:
        """Yield RAW (jpeg bytes, caption) pairs; decoding happens in the
        thread pool at emit time (bytes are also ~50x smaller than decoded
        tensors, so the shuffle buffer holds compressed data)."""
        def find(raw: Dict[str, bytes], exts) -> Optional[bytes]:
            # webdataset handlers match on the LAST dot-segment of the
            # extension, so `0001.en.txt` serves as the txt member
            for k, v in raw.items():
                if k == "__key__":
                    continue
                if k.rsplit(".", 1)[-1] in exts:
                    return v
            return None

        for shard in self._epoch_shards(epoch):
            for raw in _group_tar_samples(shard):
                try:
                    img_bytes = find(raw, _IMG_EXT)
                    if img_bytes is None:
                        continue
                    txt_bytes = find(raw, _TXT_EXT)
                    caption = (
                        txt_bytes.decode("utf-8") if txt_bytes is not None else None
                    )
                    if caption is None:
                        json_bytes = find(raw, _JSON_EXT)
                        if json_bytes is not None:
                            import json as _json

                            meta = _json.loads(json_bytes)
                            caption = meta.get(self.caption_key)
                            if caption is None:
                                # missing key stays None (sample is SKIPPED);
                                # an explicit empty caption trains like an
                                # empty .txt member would
                                caption = meta.get("caption")
                    if caption is None:
                        continue
                    yield (img_bytes, caption)
                except Exception as e:  # never kill training on one bad sample
                    logging.warning("Skipping sample (%r)", e)
                    continue

    def _decode(self, raw: tuple) -> Dict[str, Any]:
        img_bytes, caption = raw
        if getattr(self.preprocess_img, "decode_min_dim", None) is not None:
            # raw-uint8 host path: native DCT-scaled JPEG decode straight
            # from the tar bytes (PIL fallback inside apply_bytes)
            image = self.preprocess_img.apply_bytes(img_bytes)
        else:
            with Image.open(io.BytesIO(img_bytes)) as img:
                image = self.preprocess_img(img.convert("RGB"))
        text = self.tokenizer([caption])[0] if self.tokenizer else caption
        return {"images": image, "texts": text}

    def __len__(self):
        return self.num_batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        import collections
        from concurrent.futures import ThreadPoolExecutor

        rng = random.Random(self.seed * 1000 + self.epoch)
        buf: List[tuple] = []
        batch: List[Dict[str, Any]] = []
        emitted = 0
        pool = ThreadPoolExecutor(self.num_workers)
        pending: "collections.deque" = collections.deque()
        window = max(self.batch_size * 2, 2 * self.num_workers)

        def shuffled_raw():
            """Raw stream with buffer shuffle + train-mode wraparound."""
            nonlocal buf
            wrap = 0
            since_wrap = 0
            samples = self._samples()
            while True:
                try:
                    s = next(samples)
                    since_wrap += 1
                except StopIteration:
                    if self.is_train:
                        if since_wrap == 0:
                            # a full pass produced nothing: every shard is
                            # unreadable (bad path/pattern) — fail fast
                            # instead of spinning forever
                            raise RuntimeError(
                                f"webdataset shard list yielded no samples: "
                                f"{self.shards[:3]}{'...' if len(self.shards) > 3 else ''}"
                            )
                        # wrap around (fresh shard order) so every host emits
                        # the same batch count even with uneven shards
                        wrap += 1
                        since_wrap = 0
                        samples = self._samples(self.epoch + 1000000 * wrap)
                        continue
                    break
                if self.shuffle_buffer:
                    # bounded reservoir shuffle: fill to capacity, then swap
                    # the incoming sample with a random slot and yield the
                    # displaced one. The buffer never exceeds shuffle_buffer
                    # and every sample enters it exactly once (appending
                    # before the swap would both grow the buffer unboundedly
                    # and duplicate each sample — r3 review finding).
                    if len(buf) < self.shuffle_buffer:
                        buf.append(s)
                        continue
                    idx = rng.randrange(len(buf))
                    buf[idx], s = s, buf[idx]
                yield s
            rng.shuffle(buf)
            for s in buf:  # drain (eval / end of stream)
                yield s
            buf = []

        def emit_from(sample):
            nonlocal emitted
            batch.append(sample)
            if len(batch) == self.batch_size:
                out = _collate(batch)
                batch.clear()
                emitted += 1
                return out
            return None

        raw_stream = shuffled_raw()
        # train mode emits exactly num_batches (every host the same count);
        # eval exhausts the stream — the reference "will just exhaust the
        # iterator if the size is not specified" and num_batches is metadata
        limit = self.num_batches if self.is_train else None
        skip, self._skip_batches = self._skip_batches, 0
        if skip:
            for _ in range(skip * self.batch_size):
                try:
                    next(raw_stream)  # raw bytes only — no decode
                except StopIteration:
                    break
            emitted = skip  # counts toward the epoch's num_batches limit
        try:
            exhausted = False
            while limit is None or emitted < limit:
                while not exhausted and len(pending) < window:
                    try:
                        pending.append(pool.submit(self._decode, next(raw_stream)))
                    except StopIteration:
                        exhausted = True
                if not pending:
                    break
                fut = pending.popleft()
                try:
                    sample = fut.result()
                except Exception as e:  # decode failure: skip the sample
                    logging.warning("Skipping sample (%r)", e)
                    continue
                out = emit_from(sample)
                if out is not None:
                    yield out
            if not self.is_train and batch:
                yield _collate(batch)
        finally:
            pool.shutdown(wait=False, cancel_futures=True)


def get_wds_dataset(args, preprocess_fn, is_train: bool, tokenizer=None, dino_index_map=None):
    import jax

    urls = args.train_data if is_train else args.val_data
    num_samples = (
        args.train_num_samples if is_train else (args.val_num_samples or 0)
    )
    if is_train and not num_samples:
        raise RuntimeError(
            "Currently, the number of dataset samples must be specified for the "
            "training dataset. Please specify it via `--train-num-samples`."
        )
    loader = WdsLoader(
        urls,
        preprocess_img=preprocess_fn,
        tokenizer=tokenizer,
        batch_size=getattr(args, "per_host_batch_size", None) or args.batch_size,
        num_samples=num_samples,
        is_train=is_train,
        seed=getattr(args, "seed", 0),
        # train-only (reference: `resampled = dataset_resampled and is_train`)
        resampled=getattr(args, "dataset_resampled", False) and is_train,
        # val reads the FULL shard list on every host (master evaluates)
        process_index=jax.process_index() if is_train else 0,
        process_count=jax.process_count() if is_train else 1,
        num_workers=getattr(args, "workers", 8),
    )
    return DataInfo(loader)
