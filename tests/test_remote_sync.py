"""Remote-sync + remote-resume machinery (VERDICT r2 Missing #2).

Uses a local directory as the "remote" via the fsspec protocol — proves the
verification sync, the background daemon start, the final sync
(reference `main.py:256-275`, `1152-1163`), and `--resume latest` discovery
from the remote (`main.py:212-249`, `helpers.py:74-94`) without network.
"""

import json
import os

import numpy as np
import pytest

from refining_clip_via_dinov2_representations_tpu.models import register_model_config

TINY = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 16, "patch_size": 8, "width": 32, "layers": 2,
                   "head_width": 16},
    "text_cfg": {"context_length": 12, "vocab_size": 49408, "width": 32, "heads": 4,
                 "layers": 2},
}
register_model_config("tiny-remote-sync", TINY)


def _train_args(logs, name, remote, epochs):
    return [
        "--model", "tiny-remote-sync",
        "--dataset-type", "synthetic",
        "--train-num-samples", "16",
        "--batch-size", "2",
        "--epochs", str(epochs),
        "--warmup", "1",
        "--lr", "1e-3",
        "--precision", "fp32",
        "--logs", str(logs),
        "--name", name,
        "--save-frequency", "1",
        "--remote-sync", str(remote),
        "--remote-sync-protocol", "fsspec",
        "--log-every-n-steps", "1",
        "--workers", "2",
    ]


def test_remote_sync_and_remote_resume(tmp_path):
    from refining_clip_via_dinov2_representations_tpu.train.main import main

    remote = tmp_path / "bucket"
    remote.mkdir()

    # ---- run 1: train 1 epoch, periodic daemon + final sync mirror the run
    logs1 = tmp_path / "logs1"
    main(_train_args(logs1, "run", remote, epochs=1))

    remote_run = remote / "run"
    assert (remote_run / "params.txt").exists(), "verification/final sync missing"
    assert (remote_run / "loss_steps.json").exists(), "final sync missed artifacts"
    ckpt = remote_run / "checkpoints" / "epoch_1"
    assert ckpt.is_dir() and any(ckpt.rglob("*")), "checkpoint tree not synced"
    # the in-flight epoch_latest artifacts are excluded (reference behavior)
    assert not (remote_run / "checkpoints" / "epoch_latest").exists()

    # ---- run 2: fresh logs dir (no local checkpoints), resume latest FROM
    # the remote; training continues at epoch 2
    logs2 = tmp_path / "logs2"
    main(_train_args(logs2, "run", remote, epochs=2) + ["--resume", "latest"])

    # the remote checkpoint was fetched into the new local checkpoint dir
    assert (logs2 / "run" / "checkpoints" / "epoch_1").is_dir()
    # only epoch 2 was trained (start_epoch 1), and the remote artifact
    # history (epoch 0's records) was fetched + preserved ahead of it — the
    # final sync must not overwrite the remote history with a post-resume
    # slice
    steps = json.loads((logs2 / "run" / "loss_steps.json").read_text())
    assert [s["epoch"] for s in steps] == [0, 1], (
        "remote resume should merge the fetched history with exactly the "
        f"newly-trained epoch, got {[s['epoch'] for s in steps]}"
    )
    assert np.isfinite(steps[-1]["total_loss"])
    # epoch 2 checkpoint made it back to the remote via the final sync
    assert (remote_run / "checkpoints" / "epoch_2").is_dir()


def test_direct_remote_resume_url(tmp_path):
    """A direct `--resume <fsspec-url>` (non-latest) must fetch the remote
    orbax directory before restoring, matching the reference's
    load-anything `pt_load` (`file_utils.py:69-75`, `main.py:666-686`)."""
    from refining_clip_via_dinov2_representations_tpu.train.main import main

    logs1 = tmp_path / "logs1"
    main([
        "--model", "tiny-remote-sync", "--dataset-type", "synthetic",
        "--train-num-samples", "16", "--batch-size", "2", "--epochs", "1",
        "--warmup", "1", "--lr", "1e-3", "--precision", "fp32",
        "--logs", str(logs1), "--name", "run", "--save-frequency", "1",
        "--log-every-n-steps", "1", "--workers", "2",
    ])
    ckpt1 = logs1 / "run" / "checkpoints" / "epoch_1"
    assert ckpt1.is_dir()

    # fresh logs tree, resume DIRECTLY from the file:// URL of epoch_1
    logs2 = tmp_path / "logs2"
    main([
        "--model", "tiny-remote-sync", "--dataset-type", "synthetic",
        "--train-num-samples", "16", "--batch-size", "2", "--epochs", "2",
        "--warmup", "1", "--lr", "1e-3", "--precision", "fp32",
        "--logs", str(logs2), "--name", "run", "--save-frequency", "1",
        "--log-every-n-steps", "1", "--workers", "2",
        "--resume", "file://" + str(ckpt1),
    ])
    # the remote checkpoint was mirrored into a STAGING dir (not the run's
    # own history: a foreign epoch_1 must not be discoverable by a later
    # `--resume latest` or the prune logic), and only epoch 2 was trained
    assert (logs2 / "run" / "checkpoints" / "_remote_staging_p0" / "epoch_1").is_dir()
    assert not (logs2 / "run" / "checkpoints" / "epoch_1").exists()
    steps = json.loads((logs2 / "run" / "loss_steps.json").read_text())
    assert [s["epoch"] for s in steps] == [1]
    assert (logs2 / "run" / "checkpoints" / "epoch_2").is_dir()

    # graceful rejection when the URL is not an orbax checkpoint directory
    stray = tmp_path / "weights.pt"
    stray.write_bytes(b"not a checkpoint")
    with pytest.raises(FileNotFoundError, match="not an orbax checkpoint"):
        main([
            "--model", "tiny-remote-sync", "--dataset-type", "synthetic",
            "--train-num-samples", "16", "--batch-size", "2", "--epochs", "1",
            "--precision", "fp32", "--logs", str(tmp_path / "logs3"),
            "--name", "run", "--workers", "2",
            "--resume", "file://" + str(stray),
        ])


def test_latest_checkpoint_fsspec_url(tmp_path):
    """fsspec-URL discovery: natural-sort across epoch_2/epoch_10."""
    from refining_clip_via_dinov2_representations_tpu.train.checkpoint import (
        latest_checkpoint,
    )

    d = tmp_path / "ckpts"
    for n in ("epoch_2", "epoch_10", "epoch_latest", "junk"):
        (d / n).mkdir(parents=True)
        (d / n / "x").write_text("1")
    assert latest_checkpoint(str(d)).endswith("epoch_10")
    got = latest_checkpoint("file://" + str(d))
    assert got is not None and got.endswith("epoch_10") and got.startswith("file://")
    assert latest_checkpoint("file://" + str(tmp_path / "missing")) is None
