"""Distributed runtime init + host-coordination helpers.

Rebuild of `src/open_clip_train/distributed.py` on the single-JAX-runtime
model: there is no backend selection (nccl/gloo/hccl — `distributed.py:145-153`),
no Horovod, no DDP. One `jax.distributed.initialize()` per host joins the
job; collectives ride XLA over ICI/DCN. The env-detection surface
(torchrun/SLURM/OMPI variables, `distributed.py:54-90`) is preserved so
existing launchers keep working.
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Any, Optional, Tuple


def world_info_from_env() -> Tuple[int, int, int]:
    """(local_rank, global_rank, world_size) from launcher env vars
    (`distributed.py:54-90`)."""
    local_rank = 0
    for v in ("LOCAL_RANK", "MPI_LOCALRANKID", "SLURM_LOCALID", "OMPI_COMM_WORLD_LOCAL_RANK"):
        if v in os.environ:
            local_rank = int(os.environ[v])
            break
    global_rank = 0
    for v in ("RANK", "PMI_RANK", "SLURM_PROCID", "OMPI_COMM_WORLD_RANK"):
        if v in os.environ:
            global_rank = int(os.environ[v])
            break
    world_size = 1
    for v in ("WORLD_SIZE", "PMI_SIZE", "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
        if v in os.environ:
            world_size = int(os.environ[v])
            break
    return local_rank, global_rank, world_size


def is_using_distributed() -> bool:
    if "WORLD_SIZE" in os.environ:
        return int(os.environ["WORLD_SIZE"]) > 1
    if "SLURM_NTASKS" in os.environ:
        return int(os.environ["SLURM_NTASKS"]) > 1
    return False


def init_distributed_device(args=None):
    """Join the multi-host JAX job (replaces `init_process_group`,
    `distributed.py:93-195`). Returns the local device list. Populates
    args.{rank, local_rank, world_size, distributed} when args is given."""
    import jax

    # NOTE: no jax.process_count()/devices() queries before initialize() —
    # the first backend query would initialize XLA and make joining the job
    # impossible (jax.distributed must run before any backend use).
    if is_using_distributed() and not jax.distributed.is_initialized():
        local_rank, global_rank, world_size = world_info_from_env()
        coordinator = os.environ.get("MASTER_ADDR")
        port = os.environ.get("MASTER_PORT", "8476")
        jax.distributed.initialize(
            coordinator_address=f"{coordinator}:{port}" if coordinator else None,
            num_processes=world_size,
            process_id=global_rank,
        )
        logging.info(
            "joined distributed job: process %d/%d", jax.process_index(), jax.process_count()
        )

    if args is not None:
        args.world_size = jax.process_count()
        args.rank = jax.process_index()
        args.local_rank = 0
        args.distributed = jax.process_count() > 1
        args.device = str(jax.local_devices()[0])
    return jax.local_devices()


def is_master(args, local: bool = False) -> bool:
    """(`distributed.py:14-23`)"""
    import jax

    if args is not None and hasattr(args, "rank"):
        return args.rank == 0
    return jax.process_index() == 0


def broadcast_object(args, obj: Any, src: int = 0) -> Any:
    """Host-level control-metadata broadcast (`distributed.py:198-208`) via
    `multihost_utils` (pickled to a uint8 array)."""
    import jax

    if jax.process_count() == 1:
        return obj
    import numpy as np
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8) if (
        jax.process_index() == src
    ) else np.zeros((0,), np.uint8)
    # length first, then the payload padded to the agreed size
    length = multihost_utils.broadcast_one_to_all(
        np.asarray([payload.size], np.int64), is_source=jax.process_index() == src
    )
    buf = np.zeros(int(length[0]), np.uint8)
    buf[: payload.size] = payload
    out = multihost_utils.broadcast_one_to_all(
        buf, is_source=jax.process_index() == src
    )
    return pickle.loads(bytes(np.asarray(out)))


def all_gather_object(args, obj: Any) -> list:
    """(`distributed.py:211-218`) — gather a python object from every host."""
    import jax

    if jax.process_count() == 1:
        return [obj]
    gathered = []
    for src in range(jax.process_count()):
        gathered.append(broadcast_object(args, obj if jax.process_index() == src else None, src=src))
    return gathered
