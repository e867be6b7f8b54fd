"""Device-mesh construction and sharding helpers.

The single JAX runtime replaces the reference's whole distributed stack
(`src/open_clip_train/distributed.py`: process groups, NCCL/gloo backend
selection, Horovod, DDP wrapping — SURVEY §2.6). Design:

* a 2-D logical mesh `(data, model)` over ICI; `model=1` for pure data
  parallelism (the reference's only mode), >1 to weight-shard ViT-g-scale
  configs (SURVEY §7 stage 8);
* batches are sharded over `data`, parameters are replicated (or sharded over
  `model` by the rules below);
* gradient averaging is implicit in pjit (XLA all-reduce over ICI) — the DDP
  bucket machinery disappears.

Multi-host: `jax.distributed.initialize()` once per host, then the same mesh
spans all slices (`create_hybrid_device_mesh` handles ICI+DCN topology).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(coordinator_address: Optional[str] = None) -> None:
    """Join the multi-host job (replaces `init_process_group`,
    `distributed.py:157-178`). No-op single-host.

    Must run before ANY backend query: `jax.process_count()`/`jax.devices()`
    initialize XLA and make joining the job impossible afterwards, so world
    size comes from launcher env vars, never from the backend.
    """
    if jax.distributed.is_initialized():
        return
    # lazy import: function-level to keep parallel/ importable without train/
    from ..train.distributed import is_using_distributed, world_info_from_env

    if coordinator_address is None and not is_using_distributed():
        return
    _, global_rank, world_size = world_info_from_env()
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=world_size if world_size > 1 else None,
        process_id=global_rank if world_size > 1 else None,
    )


def _device_array(data: int, model: int, devices: Sequence[Any]) -> np.ndarray:
    """Arrange devices into a (data, model) array.

    Multi-slice pods (devices carrying distinct `slice_index`, i.e. TPU
    slices joined by DCN): the slow DCN axis lands on the OUTER blocks of
    the `data` dimension and the `model` (TP) axis stays inside one slice —
    TP all-reduces and the per-block FSDP/ZeRO gathers ride ICI; only the
    gradient all-reduce crosses DCN, once per step. Single slice: ICI-aware
    `create_device_mesh` when both axes are >1, plain reshape otherwise.
    """
    n = len(devices)
    slices = {getattr(d, "slice_index", 0) for d in devices}
    if len(slices) > 1:
        from jax.experimental import mesh_utils

        n_slices = len(slices)
        assert data % n_slices == 0, (
            f"data axis {data} must be divisible by the {n_slices} slices "
            f"(the model axis never spans DCN)"
        )
        return mesh_utils.create_hybrid_device_mesh(
            (data // n_slices, model), (n_slices, 1), devices=devices
        )
    if model == 1 or data == 1:
        return np.asarray(devices).reshape(data, model)
    from jax.experimental import mesh_utils

    return mesh_utils.create_device_mesh((data, model), devices=devices)


def create_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the 2-D (data, model) mesh. `data=None` → all devices / model.
    Spans multiple TPU slices (ICI+DCN) automatically — see _device_array."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(_device_array(data, model, devices), (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, microbatched: bool = False) -> NamedSharding:
    """Data sharding for batch arrays: leading axis, or axis 1 when the
    leading axis is the gradient-accumulation microbatch axis."""
    if microbatched:
        return NamedSharding(mesh, P(None, DATA_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, microbatched: bool = False) -> Any:
    """Build the global batch from this host's slice.

    Single-host: a plain device_put with data sharding on the row axis
    (axis 0, or axis 1 when `microbatched` — the [accum, rows, ...]
    gradient-accumulation layout must NOT shard the accum axis).
    Multi-host: each host's loader yields global_batch/process_count rows
    (--batch-size is per data-parallel rank, main.py), and
    `make_array_from_process_local_data` assembles the logical
    [global_batch, ...] array from the per-host slices — no cross-host
    copies, no silently dropped samples.
    """
    sharding = batch_sharding(mesh, microbatched=microbatched)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def put_full_batch(x: Any, sharding: NamedSharding) -> jax.Array:
    """Place a batch that every process holds IN FULL onto a (possibly
    multi-host) data sharding.

    Eval/serving loaders are deliberately not host-sharded (each process
    reads the full val set so metrics are global), so unlike `shard_batch`
    each process here already owns every row. Single-process this is one
    sharded host-to-device transfer (no default-device staging + reshard);
    multi-process each host materializes only the rows its addressable
    shards cover (`jax.device_put` of a host-local array onto a mesh with
    non-addressable devices raises).
    """
    x = np.asarray(x)
    if jax.process_count() > 1:
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])
    return jax.device_put(x, sharding)


# ---------------------------------------------------------------------------
# Parameter sharding rules for the `model` axis (tensor parallelism)
# ---------------------------------------------------------------------------

# up-projections (input -> 4x hidden) are column-parallel: split the OUTPUT
# feature axis, no communication until the matching down-projection
_COL_PARALLEL = (
    "mlp/c_fc/kernel",          # CLIP ViT / text MLP
    "attn/in_proj_kernel",      # fused QKV
    "fc1/kernel",               # SigLIP / timm-style MLP
    "fc1_g/kernel", "fc1_x/kernel",  # EVA02 SwiGLU gate/value
    "head_fc1/kernel",          # SigLIP MAP head
    "mlp/w0/kernel", "mlp/w1/kernel",  # ViTamin GeGLU gate/value up-proj
    "mlp/weights_in/kernel",    # DINOv2-giant SwiGLU packed gate+value
)
# down-projections (4x hidden -> input) are row-parallel: split the INPUT
# axis; XLA inserts the one all-reduce per block (Megatron dataflow)
_ROW_PARALLEL = (
    "mlp/c_proj/kernel",
    "attn/out_proj/kernel",
    "fc2/kernel",
    "head_fc2/kernel",
    "mlp/w2/kernel",            # ViTamin GeGLU down-proj
    "mlp/weights_out/kernel",   # DINOv2-giant SwiGLU down-proj
)


def _param_spec(path: Tuple[str, ...], value) -> P:
    """Megatron-style transformer sharding: MLP up-proj column-/down-proj
    row-parallel, fused QKV column-parallel, attention out row-parallel,
    embeddings vocab-replicated. Name patterns cover the standard CLIP ViT
    tower AND the native timm-family towers (SigLIP fc1/fc2, EVA02 SwiGLU
    fc1_g/fc1_x). 1-D params stay replicated (tiny); conv towers
    (ConvNeXt/ResNet stages) stay replicated — their weights are small
    relative to activations and XLA spatially partitions convs poorly."""
    name = "/".join(path)
    if value.ndim < 2:
        return P()
    if name.endswith(_COL_PARALLEL):
        return P(None, MODEL_AXIS)
    if name.endswith(_ROW_PARALLEL):
        return P(MODEL_AXIS, None)
    if name.endswith("token_embedding/embedding"):
        return P(None, MODEL_AXIS)
    return P()


def _data_layered_spec(tp: P, x, data: int, min_size: int) -> P:
    """Layer data-axis (ZeRO/FSDP) sharding onto a possibly-TP spec.

    The one rule shared by FSDP param sharding and ZeRO-1 moment sharding —
    using the SAME function for both guarantees a param and its AdamW moments
    always carry identical placements, so the optimizer update never reshards.
    Column-parallel leaves take data on axis 0, row-parallel on axis 1,
    unsharded leaves on axis 0; leaves that are scalars, small (< min_size
    elements — the gather latency isn't worth it), or not divisible stay as
    they were.
    """
    if not hasattr(x, "ndim") or x.ndim < 1 or data <= 1 or x.size < min_size:
        return tp
    if tp == P(None, MODEL_AXIS):
        if x.shape[0] % data == 0:
            return P(DATA_AXIS, MODEL_AXIS)
        return tp
    if tp == P(MODEL_AXIS, None):
        if x.ndim >= 2 and x.shape[1] % data == 0:
            return P(MODEL_AXIS, DATA_AXIS)
        return tp
    if tp == P() and x.shape[0] % data == 0:
        return P(DATA_AXIS)
    return tp


def param_shardings(
    params: Any, mesh: Mesh, fsdp: bool = False, min_size: int = 2**16
) -> Any:
    """NamedShardings for a param tree.

    Model-axis (TP) sharding applies when the mesh has a model dimension > 1.
    `fsdp=True` additionally shards every large leaf over the *data* axis
    (ZeRO-3 / FSDP): XLA all-gathers each layer's params just before use and
    reduce-scatters its grads — per-device param memory drops to ~1/data.
    This is what lets BASELINE config 5's ViT-g-14 student (1.37B params,
    ~16.4 GB fp32 params+moments replicated) train on 16 GB v5e chips: at
    data=8 the param+moment footprint is ~2 GB/chip plus one layer's gathered
    weights at a time.
    """
    data = mesh.shape[DATA_AXIS]
    model = mesh.shape[MODEL_AXIS]
    if model == 1 and not fsdp:
        return jax.tree.map(lambda _: replicated(mesh), params)

    def to_sharding(path, value):
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        spec = _param_spec(keys, value) if model > 1 else P()
        if fsdp:
            spec = _data_layered_spec(spec, value, data, min_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def opt_state_shardings(opt_state: Any, mesh: Mesh, min_size: int = 2**16) -> Any:
    """ZeRO-1 style shardings for optimizer state (AdamW m/v moments).

    The reference replicates optimizer state on every DDP rank
    (`torch.optim.AdamW` under DDP). On a TPU mesh the moments are pure
    elementwise state — they never participate in a matmul — so they can be
    sharded over the *data* axis: each m/v leaf is split on its leading axis
    when divisible, cutting per-device optimizer memory to 1/data of the
    replicated footprint (2 fp32 moments ≈ 8 bytes/param → ~1 GB saved per
    ViT-B replica pair on an 8-way mesh, and the difference between fitting
    and OOMing for ViT-g). XLA turns the update into
    compute-sharded-then-all-gather (reduce-scatter/all-gather pair), the
    standard ZeRO-1 dataflow.

    When a param is model-axis (TP) sharded, its moments MUST carry the same
    model-axis placement — a data-only P(DATA) moment would force an
    all-to-all reshard of the largest leaves on every optimizer update. The
    moment path inside optax state ends with the param path (e.g.
    ``0/mu/model/visual/.../mlp/c_fc/kernel``), so `_param_spec` applies
    directly; ZeRO data-sharding is then layered onto whichever axis the
    model axis does not occupy.

    Leaves that are scalars, too small (< min_size elements — the gather
    latency isn't worth it), or not divisible by the data-axis size stay
    data-replicated (e.g. the [197, 768] positional-embedding moment).
    """
    data = mesh.shape[DATA_AXIS]
    model = mesh.shape[MODEL_AXIS]

    def leaf_sharding(path, x):
        if not hasattr(x, "ndim") or x.ndim < 1:
            return replicated(mesh)
        keys = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        tp = _param_spec(keys, x) if model > 1 else P()
        return NamedSharding(mesh, _data_layered_spec(tp, x, data, min_size))

    return jax.tree_util.tree_map_with_path(leaf_sharding, opt_state)


def state_shardings(
    state: Any,
    mesh: Mesh,
    shard_opt_state: bool = False,
    fsdp: bool = False,
    min_size: int = 2**16,
) -> Any:
    """Shardings for a full TrainState: params by the model-axis rules
    (plus data-axis FSDP when `fsdp`), optimizer state ZeRO-1 sharded over
    data when `shard_opt_state` or `fsdp` (FSDP'd params with replicated
    moments would all-gather the moments every update — ZeRO-3 implies
    ZeRO-1), everything else replicated."""
    shardings = jax.tree.map(lambda _: replicated(mesh), state)
    shardings = shardings.replace(
        params=param_shardings(state.params, mesh, fsdp=fsdp, min_size=min_size)
    )
    if shard_opt_state or fsdp:
        shardings = shardings.replace(
            opt_state=opt_state_shardings(state.opt_state, mesh, min_size=min_size)
        )
    return shardings


def log_mesh(mesh: Mesh) -> None:
    logging.info(
        "mesh: %s over %d %s devices",
        dict(mesh.shape),
        len(mesh.devices.flatten()),
        mesh.devices.flatten()[0].platform,
    )
