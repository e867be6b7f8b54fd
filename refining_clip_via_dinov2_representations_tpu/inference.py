"""Production inference engine: bucketed batching, AOT compilation, export.

The reference has no serving path — inference happens inline in its eval
scripts (`test_scripts/extract_features_from_csv.py:63-89`), re-tracing at
whatever batch size arrives. TPU serving wants the opposite discipline:

* **static shapes** — requests are padded up to a small ladder of batch
  "buckets", so XLA compiles once per bucket and every request after warmup
  hits a cached executable;
* **AOT compilation** — `warmup()` lowers+compiles every bucket up front, so
  the first real request never pays the compile;
* **a deployable artifact** — `export()` serializes the encode functions as
  StableHLO (`jax.export`), producing files that reload and run with
  `load_exported()` without any model-building Python (the serving host
  needs jax + the artifact, not this package's model zoo).

Mixed precision follows the training stance: bf16 compute, fp32 outputs
(features are L2-normalized in fp32).
"""

from __future__ import annotations

import logging
from collections import OrderedDict
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_BUCKETS = (1, 8, 32, 128)


def _bucket_for(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


# ---------------------------------------------------------------------------
# caption_tokens: per-generation-config jit cache bound + beam-width cap
# (each cached config holds one compiled beam-search executable per bucket)
_CAPTION_JIT_CACHE = 8
_CAPTION_MAX_BEAMS = 16

# Weight-only int8 quantization (serving).
#
# The reference exposes bitsandbytes int8 linears (`utils.py:replace_linear`,
# `main.py:360-375`). The TPU-native equivalent: store every large matmul
# weight as int8 + a per-output-channel fp32 scale, and dequantize INSIDE the
# jitted encode — XLA reads int8 from HBM and fuses the upcast-multiply into
# the matmul, halving weight bandwidth. Small-batch serving is HBM-bound, so
# this is a near-2x latency win at equal MXU occupancy; per-channel scales
# keep feature cosine vs fp32 > 0.999.
# ---------------------------------------------------------------------------

_QUANT_MIN_SIZE = 1 << 14  # don't bother below 16k elements


def _quantize_leaf(w):
    """fp32 [.., out] -> (int8 [..., out], fp32 scale [out])."""
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


# Lookup tables (token embedding, positional embedding): the gather reads one
# row per token, so int8 storage buys no matmul-bandwidth win while spending
# accuracy headroom — keep them full precision. EXACT path-component names
# (a substring match would also catch real matmuls like SigLIP's
# "patch_embedding" conv) plus the relative-position table prefix.
_QUANT_SKIP_KEYS = ("embedding", "pos_embed", "positional_embedding",
                    "pos_embedding", "position_embeddings")
_QUANT_SKIP_PREFIXES = ("rel_pos",)


def quantize_variables_int8(
    variables: Dict[str, Any], min_size: int = _QUANT_MIN_SIZE
) -> Dict[str, Any]:
    """Quantize every >=2-D large *matmul* param leaf to (int8, per-channel
    scale). Embedding/positional tables are skipped (`_QUANT_SKIP_KEYS`).

    Returns a variables pytree where quantized leaves are replaced by dicts
    ``{"_q": int8, "_s": scale}`` (other leaves untouched). Use
    `dequantize_variables` inside jit to reconstruct compute-dtype weights.
    """
    def q(path, leaf):
        keys = tuple(
            str(p.key) if hasattr(p, "key") else str(p) for p in path
        )
        if any(
            k in _QUANT_SKIP_KEYS or k.startswith(_QUANT_SKIP_PREFIXES)
            for k in keys
        ):
            return leaf
        if (
            hasattr(leaf, "ndim") and leaf.ndim >= 2
            and leaf.size >= min_size
            and jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
        ):
            qv, s = _quantize_leaf(jnp.asarray(leaf, jnp.float32))
            return {"_q": qv, "_s": s}
        return leaf

    return jax.tree_util.tree_map_with_path(q, variables)


def dequantize_variables(variables: Dict[str, Any], dtype=jnp.bfloat16):
    """Inverse of `quantize_variables_int8`; call INSIDE jit so XLA fuses the
    int8 load + upcast into the consuming matmul."""
    def is_q(x):
        return isinstance(x, dict) and set(x.keys()) == {"_q", "_s"}

    def dq(x):
        if is_q(x):
            return (x["_q"].astype(dtype) * x["_s"].astype(dtype))
        return x

    return jax.tree.map(dq, variables, is_leaf=is_q)


class ClipInferenceEngine:
    """Bucketed, AOT-compiled two-tower encoder.

    Args:
      model: a built flax CLIP model (`models.build_model`).
      variables: its variable collections (params [+ batch_stats for BN
        towers — BN runs in inference mode with the stored averages]).
      image_size: (H, W) expected by the vision tower.
      context_length: text sequence length (77 for CLIP BPE).
      buckets: ascending batch-size ladder; requests pad up to the next
        bucket, larger requests are chunked by the top bucket.
      dtype: compute dtype for image inputs (params stay as stored).
      mesh: optional `(data, model)` jax Mesh for multi-device serving —
        weights are TP-sharded by the Megatron rules (`parallel.mesh`),
        request batches sharded over `data` (buckets round up to multiples
        of the data-axis size). None = single-device.
    """

    def __init__(
        self,
        model,
        variables: Dict[str, Any],
        image_size: Tuple[int, int] = (224, 224),
        context_length: int = 77,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        dtype=jnp.bfloat16,
        quantize: Optional[str] = None,  # None | "int8" (weight-only)
        quantize_min_size: int = _QUANT_MIN_SIZE,
        mesh=None,
    ):
        self.model = model
        self.image_size = tuple(image_size)
        self.context_length = int(context_length)
        self.buckets = tuple(sorted(set(int(b) for b in buckets)))
        self.dtype = dtype
        self.quantize = quantize
        self.mesh = mesh
        if quantize == "int8":
            self.variables = quantize_variables_int8(variables, quantize_min_size)
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode {quantize!r}")
        else:
            self.variables = variables
        if mesh is None:
            # materialize the weight tree on the ACCELERATOR once. The init
            # path deliberately builds params on the host CPU backend, and a
            # host-resident tree (numpy from converted checkpoints, or CPU
            # jax arrays from init) is re-transferred on EVERY jitted call —
            # measured 5 s/request for fp32 ViT-B-32 over the tunneled chip
            # vs milliseconds resident. The device must be EXPLICIT:
            # device_put(tree) with device=None keeps existing placement, so
            # it would leave CPU-resident init arrays exactly where they are.
            # (The mesh path device_puts with explicit shardings below.)
            self.variables = jax.device_put(self.variables, jax.devices()[0])

        # Multi-device serving: a (data, model) mesh shards the weights by
        # the Megatron TP rules (model axis — ViT-g-scale checkpoints that
        # don't fit one chip) and the padded request batch over the data
        # axis. Buckets are rounded up to multiples of the data-axis size so
        # every shard gets equal rows. mesh=None keeps the single-device
        # path byte-identical.
        if mesh is not None:
            from .parallel.mesh import DATA_AXIS, param_shardings, replicated

            ndata = int(mesh.shape[DATA_AXIS])
            if ndata > 1:
                self.buckets = tuple(sorted(set(
                    max(ndata, -(-b // ndata) * ndata) for b in self.buckets
                )))
            self._batch_sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(DATA_AXIS)
            )

            def shard_vars(tree):
                if "params" not in tree:
                    return jax.device_put(tree, replicated(mesh))
                sh = dict(tree)
                sh["params"] = jax.tree.map(
                    lambda x, s: jax.device_put(x, s),
                    tree["params"],
                    param_shardings(tree["params"], mesh),
                )
                for k, v in tree.items():
                    if k != "params":
                        sh[k] = jax.device_put(v, replicated(mesh))
                return sh

            if quantize == "int8":
                # int8 weights are 4x smaller, so they are replicated (the
                # "_q" leaves' shapes don't line up with the fp TP specs).
                # This means mesh+int8 does NOT get the TP memory win — warn
                # loudly so a ViT-g-scale user isn't surprised by OOM.
                logging.warning(
                    "mesh + quantize='int8': int8 weights are replicated on "
                    "every device (no TP sharding); if the quantized "
                    "checkpoint doesn't fit one chip, drop quantize and use "
                    "the TP-sharded bf16 path instead"
                )
                self.variables = jax.device_put(self.variables, replicated(mesh))
            else:
                self.variables = shard_vars(self.variables)

        def _vars(variables):
            if quantize == "int8":
                # fp32 upcast target; XLA fuses the int8 load + scale into
                # the consuming matmul, so HBM reads stay int8 regardless
                return dequantize_variables(variables, jnp.float32)
            return variables

        def encode_image(variables, images):
            feats = model.apply(
                _vars(variables), images.astype(dtype), method="encode_image",
                normalize=False,
            )
            # normalize in fp32: serving returns unit vectors
            feats = feats.astype(jnp.float32)
            return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

        def encode_text(variables, texts):
            feats = model.apply(
                _vars(variables), texts, method="encode_text", normalize=False
            )
            feats = feats.astype(jnp.float32)
            return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

        self._encode_image = jax.jit(encode_image)
        self._encode_text = jax.jit(encode_text)
        self._vars_fn = _vars
        self._caption_jits: "OrderedDict[Tuple, Any]" = OrderedDict()

    # -- shape plumbing -----------------------------------------------------

    def _image_spec(self, b: int):
        h, w = self.image_size
        if self.mesh is not None:
            return jax.ShapeDtypeStruct(
                (b, h, w, 3), jnp.float32, sharding=self._batch_sharding
            )
        return jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)

    def _text_spec(self, b: int):
        if self.mesh is not None:
            return jax.ShapeDtypeStruct(
                (b, self.context_length), jnp.int32,
                sharding=self._batch_sharding,
            )
        return jax.ShapeDtypeStruct((b, self.context_length), jnp.int32)

    def _run_bucketed(self, fn, x: np.ndarray, pad_value=0) -> np.ndarray:
        """Pad to the bucket, run, slice back; chunk past the top bucket."""
        n = x.shape[0]
        top = self.buckets[-1]
        if n > top:
            outs = [
                self._run_bucketed(fn, x[i : i + top], pad_value)
                for i in range(0, n, top)
            ]
            return np.concatenate(outs, axis=0)
        b = _bucket_for(n, self.buckets)
        if b != n:
            pad = np.full((b - n, *x.shape[1:]), pad_value, x.dtype)
            x = np.concatenate([x, pad], axis=0)
        if self.mesh is not None:
            # one sharded H2D straight from host memory (no default-device
            # staging + reshard); multi-host safe for identical request
            # batches on every process
            from .parallel.mesh import put_full_batch

            xd = put_full_batch(x, self._batch_sharding)
        else:
            xd = jnp.asarray(x)
        out = fn(self.variables, xd)
        if self.mesh is not None and jax.process_count() > 1:
            # the output spans every process's devices — np.asarray on a
            # cross-process array raises; gather the global value (every
            # process fed the identical full batch, so every process gets
            # the identical full result)
            from jax.experimental import multihost_utils

            out = multihost_utils.process_allgather(out, tiled=True)
        out = np.asarray(out)
        return out[:n]

    # -- public API ---------------------------------------------------------

    def encode_image(self, images: np.ndarray) -> np.ndarray:
        """[N,H,W,3] float (0-mean preprocessed) → [N,D] unit vectors."""
        return self._run_bucketed(self._encode_image, np.asarray(images, np.float32))

    def encode_text(self, texts: np.ndarray) -> np.ndarray:
        """[N,L] int32 token ids → [N,D] unit vectors."""
        return self._run_bucketed(
            self._encode_text, np.asarray(texts, np.int32)
        )

    def caption_tokens(
        self,
        images: np.ndarray,
        seq_len: int = 30,
        num_beams: int = 6,
        num_beam_groups: int = 3,
        min_seq_len: int = 5,
        repetition_penalty: float = 1.0,
        length_penalty: float = 1.0,
        sot_token_id: int = 49406,
        eot_token_id: int = 49407,
        pad_token_id: int = 0,
    ) -> np.ndarray:
        """Caption a preprocessed image batch with the reference's default
        grouped beam search (CoCa models only, `coca.generate_beam`):
        [N,H,W,3] floats → [N, seq_len] int32 ids (SOT … EOT, pad-filled).
        Bucketed/padded like the encoders; the jitted search is cached per
        generation config (LRU, at most 8 configs — every distinct config
        compiles per bucket, so unbounded caching would let callers grow the
        executable set without limit), and the int8/mesh paths apply
        unchanged."""
        from .models.coca import CoCa, generate_beam

        if not isinstance(self.model, CoCa):
            raise TypeError(
                "caption_tokens requires a CoCa model "
                f"(got {type(self.model).__name__})"
            )
        if not 1 < num_beams <= _CAPTION_MAX_BEAMS:
            raise ValueError(
                f"num_beams must be in [2, {_CAPTION_MAX_BEAMS}], got {num_beams}"
            )
        key = (seq_len, num_beams, num_beam_groups, min_seq_len,
               repetition_penalty, length_penalty, sot_token_id,
               eot_token_id, pad_token_id)
        fn = self._caption_jits.get(key)
        if fn is not None:
            self._caption_jits.move_to_end(key)
        if fn is None:
            model, vars_fn, dtype = self.model, self._vars_fn, self.dtype

            def _caption(variables, imgs):
                return generate_beam(
                    model, vars_fn(variables), imgs.astype(dtype),
                    num_beams=num_beams, num_beam_groups=num_beam_groups,
                    seq_len=seq_len, sot_token_id=sot_token_id,
                    eot_token_id=eot_token_id, pad_token_id=pad_token_id,
                    min_seq_len=min_seq_len,
                    repetition_penalty=repetition_penalty,
                    length_penalty=length_penalty,
                )

            fn = self._caption_jits[key] = jax.jit(_caption)
            if len(self._caption_jits) > _CAPTION_JIT_CACHE:
                self._caption_jits.popitem(last=False)
        return self._run_bucketed(fn, np.asarray(images, np.float32))

    def logit_terms(self) -> Tuple[float, float]:
        """(exp(logit_scale), logit_bias-or-0) — the affine applied to
        feature cosines (`model.py:435-442` semantics)."""
        p = self.variables["params"]
        scale = float(np.exp(np.asarray(p["logit_scale"])))
        bias = float(np.asarray(p["logit_bias"])) if "logit_bias" in p else 0.0
        return scale, bias

    def similarity(self, images: np.ndarray, texts: np.ndarray) -> np.ndarray:
        """Scaled image→text logits (`model.py:435-442` semantics: includes
        the additive logit_bias for SigLIP-style models)."""
        img_f = self.encode_image(images)
        txt_f = self.encode_text(texts)
        scale, bias = self.logit_terms()
        return scale * img_f @ txt_f.T + bias

    def warmup(self) -> None:
        """Compile AND prime the jit dispatch cache for every bucket of both
        towers, so the first real request pays zero compile latency.

        Runs one zero-filled batch per (tower, bucket) through the jitted
        callables — `.lower().compile()` would avoid the execution but its
        result is a SEPARATE executable that `jax.jit`'s dispatch cache never
        sees, so the first request would still stall on a (persistent-cache)
        compile round-trip; one tiny real execution per bucket is cheaper
        than that stall."""
        h, w = self.image_size
        for b in self.buckets:
            img = jnp.zeros((b, h, w, 3), jnp.float32)
            txt = jnp.zeros((b, self.context_length), jnp.int32)
            if self.mesh is not None:
                # same placement as the real request path: plain device_put
                # onto a mesh with non-addressable devices raises multi-host
                from .parallel.mesh import put_full_batch

                img = put_full_batch(img, self._batch_sharding)
                txt = put_full_batch(txt, self._batch_sharding)
            self._encode_image(self.variables, img).block_until_ready()
            self._encode_text(self.variables, txt).block_until_ready()

    # -- deployable artifact -------------------------------------------------

    def export(self, out_dir: str) -> Dict[str, str]:
        """Serialize per-bucket StableHLO executables (`jax.export`).

        Writes `encode_image_b{B}.shlo` / `encode_text_b{B}.shlo`.

        Single-device engines bake the params into the artifact as constants
        (a serving host reloads with `load_exported`, no flax/model code
        needed). Mesh-sharded engines export the params as CALL ARGUMENTS
        instead (GB-scale sharded constants don't belong inside StableHLO):
        the weights land in `params.npz` and every leaf's PartitionSpec plus
        the mesh shape in `sharding_manifest.json`; a serving host reloads
        with `load_exported_sharded(out_dir, name, mesh)` on a mesh with the
        same axis names/sizes (GSPMD partitioning is topology-specific by
        construction). On a multi-host mesh, process 0 writes the artifact
        and `out_dir` MUST be on a filesystem shared by all processes
        (NFS/GCS-fuse); every process verifies visibility after the barrier
        and raises if the files aren't there. Returns {name: path}.
        """
        os.makedirs(out_dir, exist_ok=True)
        if self.mesh is not None:
            return self._export_sharded(out_dir)
        written = {}
        for b in self.buckets:
            for name, fn, spec in (
                ("encode_image", self._bake(self._encode_image), self._image_spec(b)),
                ("encode_text", self._bake(self._encode_text), self._text_spec(b)),
            ):
                exp = jax.export.export(jax.jit(fn))(spec)
                path = os.path.join(out_dir, f"{name}_b{b}.shlo")
                with open(path, "wb") as f:
                    f.write(exp.serialize())
                written[f"{name}_b{b}"] = path
        return written

    def _export_sharded(self, out_dir: str) -> Dict[str, str]:
        import json

        from flax.core import unfreeze
        from jax.tree_util import tree_flatten_with_path

        # plain nested dicts: the reload side rebuilds the same pytree
        # structure from the manifest, so the exported call signature must
        # not depend on FrozenDict-vs-dict
        variables = unfreeze(self.variables)
        var_specs = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding),
            variables,
        )
        # Serialize every bucket's HLO and gather every param leaf to host
        # memory BEFORE touching the filesystem: an error mid-way (e.g. a
        # leaf spanning non-addressable devices) must not leave a
        # half-written artifact directory.
        blobs = {}
        written = {}
        for b in self.buckets:
            for name, fn, spec in (
                ("encode_image", self._encode_image, self._image_spec(b)),
                ("encode_text", self._encode_text, self._text_spec(b)),
            ):
                exp = jax.export.export(fn)(var_specs, spec)
                blobs[f"{name}_b{b}"] = exp.serialize()
                written[f"{name}_b{b}"] = os.path.join(out_dir, f"{name}_b{b}.shlo")

        multihost = jax.process_count() > 1
        if multihost:
            # a TP-sharded leaf spans non-addressable devices on a multi-host
            # mesh; np.asarray would raise — gather the global value instead
            from jax.experimental import multihost_utils

        flat, _ = tree_flatten_with_path(variables)
        arrays, leaves_meta = {}, []
        for i, (path, leaf) in enumerate(flat):
            spec = [
                list(s) if isinstance(s, tuple) else s
                for s in tuple(leaf.sharding.spec)
            ]
            if multihost:
                arr = np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
            else:
                arr = np.asarray(leaf)
            dtype_name = str(arr.dtype)
            if dtype_name == "bfloat16":
                # npy can't serialize ml_dtypes extension dtypes; store the
                # raw bit pattern (the manifest records the real dtype; the
                # load side views it back) — half the artifact bytes of an
                # fp32 widening, which matters at the GB scale this targets
                arr = arr.view(np.uint16)
            elif arr.dtype.kind not in "fiub":
                # other extension dtypes (fp8 etc.): widen to fp32 — exact,
                # and exact again on the astype back at load
                arr = arr.astype(np.float32)
            arrays[f"leaf_{i:05d}"] = arr
            leaves_meta.append({
                "path": [str(getattr(k, "key", k)) for k in path],
                "spec": spec,
                "dtype": dtype_name,
            })
        import uuid

        manifest = {
            "mesh_axes": {str(k): int(v) for k, v in self.mesh.shape.items()},
            "batch_spec": [
                list(s) if isinstance(s, tuple) else s
                for s in tuple(self._batch_sharding.spec)
            ],
            "leaves": leaves_meta,
            # unique per export: the params cache keys on this, so a
            # re-export to the same dir invalidates even on filesystems
            # with coarse mtime (NFS/GCS-fuse — the shared-FS multi-host
            # artifact home) where same-shape params.npz is byte-count
            # identical and mtime alone can miss
            "export_id": uuid.uuid4().hex,
        }
        written["params"] = os.path.join(out_dir, "params.npz")
        written["manifest"] = os.path.join(out_dir, "sharding_manifest.json")

        # everything gathered — write, on one process only when out_dir is a
        # shared filesystem (every process returns the same path mapping)
        if jax.process_index() == 0:
            for key, blob in blobs.items():
                with open(written[key], "wb") as f:
                    f.write(blob)
            np.savez(written["params"], **arrays)
            with open(written["manifest"], "w") as f:
                json.dump(manifest, f)
        if multihost:
            multihost_utils.sync_global_devices("export_sharded_written")
            # the path mapping is only meaningful if every process can see
            # the files process 0 wrote — i.e. out_dir is on a SHARED
            # filesystem. On per-host local disks ranks != 0 would otherwise
            # pass the barrier and fail much later at load time.
            missing = [p for p in written.values() if not os.path.exists(p)]
            if missing:
                raise FileNotFoundError(
                    f"export(out_dir={out_dir!r}): process "
                    f"{jax.process_index()} cannot see "
                    f"{[os.path.basename(m) for m in missing]} written by "
                    "process 0 — multi-host export requires out_dir on a "
                    "filesystem shared by all processes (NFS/GCS-fuse); "
                    "point out_dir at shared storage or export single-host"
                )
        return written

    def _bake(self, fn):
        variables = self.variables

        def baked(x):
            return fn(variables, x)

        return baked


def load_exported(path: str):
    """Reload one exported encoder: returns a callable (array) -> array."""
    with open(path, "rb") as f:
        exp = jax.export.deserialize(f.read())
    return jax.jit(exp.call)


def _to_partition_spec(entries):
    from jax.sharding import PartitionSpec

    return PartitionSpec(
        *[tuple(s) if isinstance(s, list) else s for s in entries]
    )


# (abspath(out_dir), freshness, mesh) -> (manifest, device-resident
# variables pytree): every encoder/bucket loaded from the same artifact onto
# the same mesh shares ONE device copy of the weights (a default-bucket
# two-tower engine is 6 loads; private copies would multiply GB-scale weight
# HBM by 6). The freshness token (mtime+size of manifest and params.npz)
# makes a re-export to the same directory a cache miss instead of silently
# serving stale weights; stale entries are dropped so their device copies
# can be collected.
_SHARDED_PARAMS_CACHE: Dict[Any, Any] = {}


def _artifact_freshness(out_dir: str):
    import json

    token = []
    for name in ("sharding_manifest.json", "params.npz"):
        st = os.stat(os.path.join(out_dir, name))
        token.append((name, st.st_mtime_ns, st.st_size))
    # export_id is unique per export() call — catches a re-export that
    # mtime+size can miss (same-shape params.npz on a coarse-mtime shared
    # FS). Older artifacts without one fall back to mtime+size alone.
    with open(os.path.join(out_dir, "sharding_manifest.json")) as f:
        token.append(("export_id", json.load(f).get("export_id")))
    return tuple(token)


def _load_sharded_params(out_dir: str, mesh):
    import json

    from jax.sharding import NamedSharding

    base = os.path.abspath(out_dir)
    fresh = _artifact_freshness(out_dir)
    key = (base, fresh, mesh)
    hit = _SHARDED_PARAMS_CACHE.get(key)
    if hit is not None:
        return hit
    # drop entries for SUPERSEDED versions of this artifact (same dir,
    # older freshness) — same-version entries on other meshes stay live
    for stale in [
        k for k in _SHARDED_PARAMS_CACHE if k[0] == base and k[1] != fresh
    ]:
        del _SHARDED_PARAMS_CACHE[stale]

    with open(os.path.join(out_dir, "sharding_manifest.json")) as f:
        manifest = json.load(f)
    want = manifest["mesh_axes"]
    have = {str(k): int(v) for k, v in mesh.shape.items()}
    if have != want:
        raise ValueError(
            f"mesh mismatch: artifact was exported on mesh axes {want}, "
            f"got {have} (GSPMD artifacts are topology-specific)"
        )

    variables: Dict[str, Any] = {}
    with np.load(os.path.join(out_dir, "params.npz")) as data:
        for i, meta in enumerate(manifest["leaves"]):
            arr = data[f"leaf_{i:05d}"]
            if str(arr.dtype) != meta["dtype"]:
                target = jnp.dtype(meta["dtype"])
                if arr.dtype == np.uint16 and meta["dtype"] == "bfloat16":
                    arr = arr.view(target)  # stored bit pattern, not values
                else:
                    arr = arr.astype(target)
            node = variables
            for k in meta["path"][:-1]:
                node = node.setdefault(k, {})
            node[meta["path"][-1]] = jax.device_put(
                arr, NamedSharding(mesh, _to_partition_spec(meta["spec"]))
            )
    _SHARDED_PARAMS_CACHE[key] = (manifest, variables)
    return manifest, variables


def load_exported_sharded(out_dir: str, name: str, mesh):
    """Reload one mesh-sharded exported encoder (e.g. ``encode_image_b8``)
    from an `export()`ed directory onto `mesh`.

    `mesh` must have the same axis names and sizes as the exporting engine's
    (the manifest records them; a mismatch raises). The params are read from
    `params.npz`, device_put ONCE per (artifact, mesh) by their recorded
    PartitionSpecs and shared across every encoder/bucket loaded from the
    same directory — the returned callable takes one full (bucket-sized)
    host batch and returns the features. No flax/model code is needed, only
    jax and the artifact.
    """
    from jax.sharding import NamedSharding

    manifest, variables = _load_sharded_params(out_dir, mesh)
    call = load_exported(os.path.join(out_dir, f"{name}.shlo"))
    batch_sharding = NamedSharding(mesh, _to_partition_spec(manifest["batch_spec"]))

    def run(x):
        return call(variables, jax.device_put(np.asarray(x), batch_sharding))

    return run


def create_engine(
    model_name: str,
    pretrained: Optional[str] = None,
    checkpoint: Optional[str] = None,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    dtype=jnp.bfloat16,
    quantize: Optional[str] = None,
    warm: bool = True,
    mesh=None,
):
    """Factory: registry name (+ optional pretrained tag / checkpoint path)
    → warm engine + preprocess + tokenizer, the full serving bundle.
    ``warm=True`` AOT-compiles every (tower, bucket) pair before returning so
    the first request never pays XLA compile latency; pass ``warm=False`` to
    defer (e.g. when only exporting StableHLO)."""
    from .models.factory import (
        create_model_and_transforms,
        get_tokenizer,
        load_checkpoint,
    )

    model, variables, _, preprocess = create_model_and_transforms(
        model_name, pretrained=pretrained
    )
    if checkpoint:
        variables, _ = load_checkpoint(model, variables, checkpoint)
    image_size = model.vision_cfg.image_size
    if isinstance(image_size, int):
        image_size = (image_size, image_size)
    engine = ClipInferenceEngine(
        model, variables,
        image_size=tuple(image_size),
        context_length=model.text_cfg.context_length,
        buckets=buckets, dtype=dtype, quantize=quantize, mesh=mesh,
    )
    if warm:
        engine.warmup()
    return engine, preprocess, get_tokenizer(model_name)
