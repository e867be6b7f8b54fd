"""Remote checkpoint IO + background sync (`src/open_clip_train/file_utils.py`).

Same mechanism set as the reference: `aws s3 sync` subprocess path, fsspec
key-by-key path (both excluding the in-flight `epoch_latest` artifacts), a
daemon process on a fixed cadence, and fsspec-backed load/exists helpers.
fsspec is optional — functions degrade to local filesystem when absent.
"""

from __future__ import annotations

import logging
import multiprocessing
import os
import subprocess
import time

try:
    import fsspec

    _HAS_FSSPEC = True
except ImportError:  # pragma: no cover
    fsspec = None
    _HAS_FSSPEC = False


def remote_sync_s3(local_dir: str, remote_dir: str) -> bool:
    """(`file_utils.py:10-18`)"""
    result = subprocess.run(
        ["aws", "s3", "sync", local_dir, remote_dir,
         "--exclude", "*epoch_latest.pt", "--exclude", "*epoch_latest*"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    if result.returncode != 0:
        logging.error(
            "Error: Failed to sync with S3 bucket %s", result.stderr.decode("utf-8")
        )
        return False
    logging.info("Successfully synced with S3 bucket")
    return True


def remote_sync_fsspec(local_dir: str, remote_dir: str) -> bool:
    """(`file_utils.py:20-42`)"""
    if not _HAS_FSSPEC:
        logging.error("fsspec not available for remote sync")
        return False
    a = fsspec.get_mapper(local_dir)
    b = fsspec.get_mapper(remote_dir)
    for k in a:
        if "epoch_latest" in k:
            continue
        logging.info("Attempting to sync %s", k)
        if k in b and len(a[k]) == len(b[k]):
            logging.debug("Skipping remote sync for %s.", k)
            continue
        try:
            b[k] = a[k]
            logging.info("Successful sync for %s.", k)
        except Exception as e:
            logging.info("Error during remote sync for %s: %s", k, e)
            return False
    return True


def remote_sync(local_dir: str, remote_dir: str, protocol: str) -> bool:
    logging.info("Starting remote sync.")
    if protocol == "s3":
        return remote_sync_s3(local_dir, remote_dir)
    if protocol == "fsspec":
        return remote_sync_fsspec(local_dir, remote_dir)
    logging.error("Remote protocol not known")
    return False


def keep_running_remote_sync(sync_every: int, local_dir: str, remote_dir: str, protocol: str):
    while True:
        time.sleep(sync_every)
        remote_sync(local_dir, remote_dir, protocol)


def start_sync_process(sync_every: int, local_dir: str, remote_dir: str, protocol: str):
    """Background sync daemon (`file_utils.py:54-61`); caller starts it.
    daemon=True (unlike the reference) so an early-returning run can never
    hang on join — the final sync still flushes everything."""
    p = multiprocessing.Process(
        target=keep_running_remote_sync,
        args=(sync_every, local_dir, remote_dir, protocol),
    )
    p.daemon = True
    return p


def pt_load(file_path: str, map_location=None):
    """fsspec-capable torch-checkpoint load (`file_utils.py:69-75`)."""
    import torch

    if file_path.startswith("s3"):
        logging.info("Loading remote checkpoint, which may take a bit.")
    if _HAS_FSSPEC:
        with fsspec.open(file_path, "rb") as f:
            return torch.load(f, map_location=map_location, weights_only=False)
    return torch.load(file_path, map_location=map_location, weights_only=False)


def check_exists(file_path: str) -> bool:
    """(`file_utils.py:77-83`)"""
    if _HAS_FSSPEC:
        try:
            with fsspec.open(file_path):
                pass
        except FileNotFoundError:
            return False
        return True
    return os.path.exists(file_path)
