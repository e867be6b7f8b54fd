"""Tracker facade (`train/loggers.py`): TB event files written, MLflow
env-gated off by default, metric-name sanitization."""

import glob
import os

from refining_clip_via_dinov2_representations_tpu.train.helpers import (
    sanitize_metric_name,
)
from refining_clip_via_dinov2_representations_tpu.train.loggers import Tracker


def test_tracker_writes_tb_events(tmp_path):
    tr = Tracker(str(tmp_path))
    tr.log_scalars({"loss": 1.5, "image_to_text_R@1": 0.4}, step=1, prefix="val")
    tr.finish()
    events = glob.glob(os.path.join(str(tmp_path), "tensorboard", "events.*"))
    if tr._tb is None:  # no tensorflow in the env: degraded-to-no-op path
        assert events == []
    else:
        assert events


def test_tracker_noop_without_backends(tmp_path, monkeypatch):
    monkeypatch.delenv("MLFLOW_ENABLE", raising=False)
    tr = Tracker(str(tmp_path), enable_tb=False)
    tr.log_scalars({"a": 1.0}, step=0)  # must not raise
    tr.log_artifact(__file__)
    tr.finish()
    assert tr._tb is None and tr._mlflow is None


def test_metric_name_sanitization():
    # MLflow rejects '@' (reference helpers.py:459-463)
    assert "@" not in sanitize_metric_name("image_to_text_R@1")
