"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh BEFORE jax import — the
TPU-native equivalent of the reference's "multi-node testing without a
cluster" strategy (SURVEY §4): every sharding/collective test runs against 8
fake devices on one host.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The deployment's sitecustomize imports jax at interpreter start (before this
# file runs), so the env var alone is too late — force the platform through
# the live config as well.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
