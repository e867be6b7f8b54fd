"""webdataset reader semantics (r3 review findings): bounded shuffle buffer,
full brace expansion, webdataset-convention sample grouping, JSON caption
handling."""

import io
import json
import tarfile

import numpy as np
import pytest
from PIL import Image

from refining_clip_via_dinov2_representations_tpu.train.webdataset import (
    WdsLoader,
    _group_tar_samples,
    expand_urls,
)
from refining_clip_via_dinov2_representations_tpu.transform import image_transform


def test_expand_urls_multiple_groups_and_lists():
    # every brace group expands (cartesian), like the reference's braceexpand
    assert expand_urls("s-{00..01}/{000..001}.tar") == [
        "s-00/000.tar", "s-00/001.tar", "s-01/000.tar", "s-01/001.tar",
    ]
    assert expand_urls("{a,b}-{0..1}.tar") == [
        "a-0.tar", "a-1.tar", "b-0.tar", "b-1.tar",
    ]
    # '::'-joined lists, zero-padding width, and non-expansion braces
    assert expand_urls("x.tar::y-{08..10}.tar") == [
        "x.tar", "y-08.tar", "y-09.tar", "y-10.tar",
    ]
    assert expand_urls("weird-{notarange}.tar") == ["weird-notarange.tar"]


def _add(tf, name, data: bytes):
    info = tarfile.TarInfo(name)
    info.size = len(data)
    tf.addfile(info, io.BytesIO(data))


def _jpeg_bytes(rng):
    img = Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return buf.getvalue()


def test_group_tar_samples_webdataset_convention(tmp_path):
    """Key = full path up to the FIRST dot of the basename; ext = the rest.
    `0001.en.txt` groups with `0001.jpg`; same basename in different
    directories stays distinct (webdataset base_plus_ext)."""
    rng = np.random.default_rng(0)
    shard = tmp_path / "s.tar"
    with tarfile.open(shard, "w") as tf:
        _add(tf, "a/0001.jpg", _jpeg_bytes(rng))
        _add(tf, "a/0001.en.txt", b"caption a1")
        _add(tf, "b/0001.jpg", _jpeg_bytes(rng))
        _add(tf, "b/0001.txt", b"caption b1")
    samples = list(_group_tar_samples(str(shard)))
    assert len(samples) == 2, "directories must not merge samples"
    keys = sorted(s["__key__"].decode() for s in samples)
    assert keys == ["a/0001", "b/0001"]
    a = next(s for s in samples if s["__key__"] == b"a/0001")
    assert "en.txt" in a, "multi-extension member keeps its full ext"


def test_multi_extension_caption_joins_image(tmp_path):
    rng = np.random.default_rng(1)
    shard = tmp_path / "s.tar"
    with tarfile.open(shard, "w") as tf:
        for i in range(4):
            _add(tf, f"{i:04d}.jpg", _jpeg_bytes(rng))
            _add(tf, f"{i:04d}.en.txt", f"caption {i}".encode())
    loader = WdsLoader(
        str(shard),
        preprocess_img=image_transform(16, is_train=False),
        tokenizer=None,
        batch_size=2,
        num_samples=4,
        is_train=False,
        shuffle_buffer=0,
    )
    batches = list(loader)
    caps = [c for b in batches for c in b["texts"]]
    assert sorted(caps) == [f"caption {i}" for i in range(4)]


def test_json_caption_missing_key_skips_sample(tmp_path):
    """json without the caption key skips the sample; an explicit empty
    caption trains (same as an empty .txt member would)."""
    rng = np.random.default_rng(2)
    shard = tmp_path / "s.tar"
    with tarfile.open(shard, "w") as tf:
        _add(tf, "0000.jpg", _jpeg_bytes(rng))
        _add(tf, "0000.json", json.dumps({"caption": "real caption"}).encode())
        _add(tf, "0001.jpg", _jpeg_bytes(rng))
        _add(tf, "0001.json", json.dumps({"other": "no caption here"}).encode())
        _add(tf, "0002.jpg", _jpeg_bytes(rng))
        _add(tf, "0002.json", json.dumps({"caption": ""}).encode())
    loader = WdsLoader(
        str(shard),
        preprocess_img=image_transform(16, is_train=False),
        tokenizer=None,
        batch_size=4,
        num_samples=3,
        is_train=False,
        shuffle_buffer=0,
    )
    caps = [c for b in loader for c in b["texts"]]
    assert sorted(caps) == ["", "real caption"], caps


def test_shuffle_buffer_bounded_and_duplicate_free(tmp_path):
    """The reservoir buffer must stay at its cap and every sample must be
    emitted exactly once per pass (r3 finding: append-then-swap grew the
    buffer unboundedly and duplicated entries)."""
    rng = np.random.default_rng(3)
    shard = tmp_path / "s.tar"
    n = 60
    with tarfile.open(shard, "w") as tf:
        for i in range(n):
            _add(tf, f"{i:04d}.jpg", _jpeg_bytes(rng))
            _add(tf, f"{i:04d}.txt", f"caption {i}".encode())
    loader = WdsLoader(
        str(shard),
        preprocess_img=image_transform(16, is_train=False),
        tokenizer=None,
        batch_size=6,
        num_samples=n,
        is_train=True,
        shuffle_buffer=8,
        seed=5,
    )
    batches = list(loader)
    assert len(batches) == n // 6
    caps = [c for b in batches for c in b["texts"]]
    # train mode wraps the stream, so up to shuffle_buffer samples of pass 1
    # stay buffered while pass-2 duplicates emit — but a healthy reservoir
    # emits >= n - shuffle_buffer distinct samples and never emits any
    # sample more than twice in n yields. (The buggy append-then-swap
    # variant collapsed uniqueness far below this and tripled entries.)
    from collections import Counter

    counts = Counter(caps)
    assert len(counts) >= n - 8, f"only {len(counts)} unique of {n}"
    assert max(counts.values()) <= 2, counts.most_common(3)
    # shuffling actually happened (not identity order)
    assert caps != [f"caption {i}" for i in range(len(caps))]


def test_skip_next_batches_resumes_exact_order(tmp_path):
    """Mid-epoch resume: skip_next_batches(k) consumes the first k batches'
    raw records (same deterministic epoch-seeded order, no decode) so the
    continued stream emits batches k+1..num_batches identically to the
    uninterrupted epoch."""
    rng = np.random.default_rng(7)
    shard = tmp_path / "s.tar"
    n = 60
    with tarfile.open(shard, "w") as tf:
        for i in range(n):
            _add(tf, f"{i:04d}.jpg", _jpeg_bytes(rng))
            _add(tf, f"{i:04d}.txt", f"caption {i}".encode())

    def make():
        return WdsLoader(
            str(shard),
            preprocess_img=image_transform(16, is_train=False),
            tokenizer=None,
            batch_size=6,
            num_samples=n,
            is_train=True,
            shuffle_buffer=8,
            seed=5,
        )

    full = [list(b["texts"]) for b in make()]
    assert len(full) == n // 6

    resumed_loader = make()
    resumed_loader.skip_next_batches(2)
    resumed = [list(b["texts"]) for b in resumed_loader]
    assert len(resumed) == len(full) - 2
    assert resumed == full[2:]
    # one-shot: the next epoch iterates from the start again
    assert [list(b["texts"]) for b in resumed_loader] == full
