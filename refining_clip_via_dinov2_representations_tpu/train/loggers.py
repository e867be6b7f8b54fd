"""Experiment tracking: TensorBoard + MLflow + wandb.

Reference behaviour (`src/open_clip_train/train.py:455-533`,
`main.py:123-189,457-466`): TensorBoard scalars under train/* and val/*
every `--log-every-n-steps`; MLflow is env-gated (MLFLOW_ENABLE /
MLFLOW_TRACKING_URI / MLFLOW_EXPERIMENT) and receives params, per-epoch
metrics (names sanitized — '@' is illegal), and artifacts. wandb is flag
-gated (`--report-to wandb`, `--wandb-project-name`, `--wandb-notes` —
vestigial in the fork, `main.py:26-29,584+`, but part of its flag surface).

All backends are optional: TensorBoard writes through tf.summary when
tensorflow is importable, MLflow when mlflow is importable, wandb when
wandb is importable; otherwise the tracker degrades to a no-op with one
warning.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

from .helpers import sanitize_metric_name


class Tracker:
    """Facade over TensorBoard + MLflow with the reference's key names."""

    def __init__(self, log_dir: str, args=None, enable_tb: bool = True):
        self._tb = None
        self._mlflow = None
        self._wandb = None

        want_wandb = args is not None and "wandb" in (
            getattr(args, "report_to", "") or ""
        )
        # process-0 gate: on a multi-host run every process builds a Tracker,
        # but only rank 0 should own the wandb run (the reference gates the
        # same way via `is_master`, main.py:457-466)
        if want_wandb and int(getattr(args, "rank", 0) or 0) == 0:
            try:
                import wandb

                wandb.init(
                    project=getattr(args, "wandb_project_name", "open-clip"),
                    name=getattr(args, "name", None),
                    notes=getattr(args, "wandb_notes", "") or None,
                    config={k: str(v)[:500] for k, v in sorted(vars(args).items())},
                    dir=log_dir,
                )
                self._wandb = wandb
            except Exception:
                # degrade to a no-op on ANY init failure (not importable,
                # not logged in, network down) per the module contract —
                # tracking must never take down a training run
                logging.warning(
                    "--report-to wandb set but wandb.init failed; continuing "
                    "without wandb", exc_info=True,
                )

        if enable_tb:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(
                    os.path.join(log_dir, "tensorboard")
                )
            except ImportError:
                logging.warning("tensorboard logging unavailable (no tensorflow)")

        if os.environ.get("MLFLOW_ENABLE"):
            try:
                import mlflow

                uri = os.environ.get("MLFLOW_TRACKING_URI")
                if uri:
                    mlflow.set_tracking_uri(uri)
                mlflow.set_experiment(os.environ.get("MLFLOW_EXPERIMENT", "open_clip_tpu"))
                mlflow.start_run(run_name=getattr(args, "name", None))
                self._mlflow = mlflow
                if args is not None:
                    params = {
                        k: str(v)[:500] for k, v in sorted(vars(args).items())
                    }
                    # mlflow caps batch size; chunk
                    items = list(params.items())
                    for i in range(0, len(items), 90):
                        mlflow.log_params(dict(items[i : i + 90]))
            except ImportError:
                logging.warning("MLFLOW_ENABLE set but mlflow not importable")

    def log_scalars(self, metrics: Dict[str, float], step: int, prefix: str = "train"):
        named = {f"{prefix}/{k}": float(v) for k, v in metrics.items()}
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in named.items():
                    tf.summary.scalar(k, v, step=step)
        if self._mlflow is not None:
            self._mlflow.log_metrics(
                {sanitize_metric_name(k): v for k, v in named.items()}, step=step
            )
        if self._wandb is not None:
            # no `step=`: wandb drops rows whose step DECREASES, and this
            # facade is called with global-step for train/* but epoch number
            # for val/* (main.py evaluate path) — passing those as wandb
            # steps would silently discard every val row after epoch 1. The
            # reference logs the same way (`train.py:473`: 'step': step in
            # the data dict); the caller's step rides as a plain field.
            self._wandb.log(dict(named, step=step))

    def log_artifact(self, path: str):
        if self._mlflow is not None and os.path.exists(path):
            self._mlflow.log_artifact(path)

    def finish(self):
        if self._tb is not None:
            self._tb.close()
        if self._mlflow is not None:
            self._mlflow.end_run()
        if self._wandb is not None:
            self._wandb.finish()
