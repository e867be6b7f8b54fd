"""Two-process jax.distributed smoke test (SURVEY §4: multi-node testing
without a cluster).

Spawns a real 2-process JAX job over localhost (CPU backend, 2 virtual
devices per process = 4 global), driving the SAME code paths the CLI uses:
`init_distributed_device` (env detection + jax.distributed.initialize), a
mesh spanning both hosts, `shard_batch`'s make_array_from_process_local_data
assembly, a psum across the global mesh, and per-process Loader sharding.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

import types
import numpy as np

sys.path.insert(0, os.environ["REPO_ROOT"])
from refining_clip_via_dinov2_representations_tpu.train.distributed import (
    init_distributed_device, all_gather_object,
)
from refining_clip_via_dinov2_representations_tpu.parallel.mesh import (
    create_mesh, shard_batch,
)
from refining_clip_via_dinov2_representations_tpu.train.data import Loader

args = types.SimpleNamespace()
init_distributed_device(args)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
rank = jax.process_index()

# ---- global mesh + per-host batch assembly ----
mesh = create_mesh(model=1)           # data=4 over both hosts
assert dict(mesh.shape) == {"data": 4, "model": 1}
# each host contributes rows [rank*4, rank*4+4): global batch of 8
local = np.arange(rank * 4, rank * 4 + 4, dtype=np.float32).reshape(4, 1)
batch = shard_batch({"x": local}, mesh)
assert batch["x"].shape == (8, 1), batch["x"].shape

@jax.jit
def total(x):
    return x.sum()

s = float(total(batch["x"]))
assert s == float(np.arange(8).sum()), s   # 28: no dropped/duplicated rows

# ---- loader shards by process_index ----
class IdxDataset:
    def __len__(self):
        return 16
    def __getitem__(self, i):
        return {"idx": np.asarray(i)}

loader = Loader(IdxDataset(), batch_size=4, shuffle=True, drop_last=True,
                seed=3, num_workers=1,
                process_index=rank, process_count=jax.process_count())
mine = sorted(int(i) for b in loader for i in b["idx"])
assert len(mine) == 8, mine
both = all_gather_object(args, mine)
if rank == 0:
    assert not (set(both[0]) & set(both[1])), both
    assert len(both[0]) == len(both[1]) == 8
    print("MULTIHOST_OK", json.dumps({"sum": s, "shards": both}))
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_init_and_sharding(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            WORLD_SIZE="2", RANK=str(rank), MASTER_ADDR="127.0.0.1",
            MASTER_PORT=str(port), REPO_ROOT=repo_root,
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        env.pop("JAX_PLATFORMS", None)  # worker pins cpu itself (sitecustomize)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    assert "MULTIHOST_OK" in outs[0], outs[0]
