"""Checkpoint save/resume via Orbax + torch-interop export.

Replaces the reference's torch.save dict flow (`main.py:940-974`,
`file_utils.py`):

* per-epoch orbax checkpoints `epoch_N` holding
  {params, opt_state, step, epoch} — async-capable, atomic by construction
  (orbax writes to tmp + renames, the reference hand-rolled that with
  `os.replace`, `main.py:965-969`);
* `latest` resume discovery via natural sort (`helpers.py:74-94`);
* `export_torch_checkpoint` writes the reference's
  `{epoch, name, state_dict}` .pt layout so reference tooling and the
  offline eval scripts can consume our runs.
"""

from __future__ import annotations

import logging
import os
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _natural_key(s: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]


def latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
    """Newest checkpoint path by natural sort (`helpers.py:74-94`).

    Accepts a local directory or any fsspec URL (``s3://…``, ``file://…``) —
    the reference's remote discovery shells out to ``aws s3 ls``
    (`helpers.py:76-89`); here one fsspec listing covers every protocol."""
    if "://" in checkpoint_dir:
        import fsspec

        fs, root = fsspec.core.url_to_fs(checkpoint_dir)
        try:
            entries = fs.ls(root, detail=False)
        except FileNotFoundError:
            return None
        names = [
            e.rstrip("/").rsplit("/", 1)[-1]
            for e in entries
        ]
        cands = sorted(
            (n for n in names if re.match(r"^epoch_\d+(_preempt)?$", n)),
            key=_natural_key,
        )
        if not cands:
            return None
        proto = checkpoint_dir.split("://", 1)[0]
        return f"{proto}://{root.rstrip('/')}/{cands[-1]}"
    d = Path(checkpoint_dir)
    if not d.is_dir():
        return None
    # `epoch_N_preempt` dirs (partial-epoch saves under --save-on-preemption)
    # natural-sort after their epoch_N sibling, so resume prefers the newer
    # partial state; the payload's epoch field still says "redo epoch N".
    cands = [
        p for p in d.iterdir() if re.match(r"^epoch_\d+(_preempt)?$", p.name)
    ]
    if not cands:
        return None
    return str(sorted(cands, key=lambda p: _natural_key(p.name))[-1])


def fetch_remote_checkpoint(remote_path: str, local_dir: str) -> str:
    """Download a remote orbax checkpoint directory to `local_dir` and return
    the local path (orbax restores from local filesystems). The reference
    loads remote .pt files through one fsspec.open (`file_utils.py:69-75`);
    orbax checkpoints are directories, so this recursively mirrors the tree."""
    import fsspec

    fs, root = fsspec.core.url_to_fs(remote_path)
    name = root.rstrip("/").rsplit("/", 1)[-1]
    dest = os.path.join(local_dir, name)
    os.makedirs(dest, exist_ok=True)
    fs.get(root.rstrip("/") + "/", dest + "/", recursive=True)
    return dest


# One long-lived AsyncCheckpointer per target directory role. Async saves
# snapshot device arrays to host, return, and serialize in a background
# thread — training overlaps the write (seconds at ViT-H scale, orbax is
# still atomic via tmp-dir + rename). Wait-at-entry on the SAME checkpointer
# guarantees at most one outstanding save per role, which also makes
# delete_previous safe (the previous epoch's write has finished before the
# next save starts).
_ASYNC_CKPTRS: Dict[str, Any] = {}


def _async_checkpointer(role: str):
    import orbax.checkpoint as ocp

    c = _ASYNC_CKPTRS.get(role)
    if c is None:
        c = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        _ASYNC_CKPTRS[role] = c
    return c


def wait_for_checkpoints() -> None:
    """Block until every outstanding async checkpoint write has committed.
    Call before reading checkpoints back, final remote sync, or exit."""
    for c in _ASYNC_CKPTRS.values():
        c.wait_until_finished()


def save_checkpoint(
    checkpoint_dir: str,
    state,
    epoch: int,
    save_most_recent: bool = False,
    delete_previous: bool = False,
    async_save: bool = False,
    name_suffix: str = "",
    step_in_epoch: int = 0,
    data_order: Optional[Dict[str, int]] = None,
) -> str:
    import orbax.checkpoint as ocp

    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.abspath(
        os.path.join(checkpoint_dir, f"epoch_{epoch}{name_suffix}")
    )
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
        # optimizer steps already executed inside `epoch` (0 for a completed
        # epoch). A preemption save records its position here so resume can
        # continue MID-epoch instead of redoing it (the reference's torch
        # checkpoints are epoch-granular, `main.py:940-948`).
        "step_in_epoch": np.asarray(step_in_epoch),
    }
    if data_order:
        # the flags that determine the deterministic batch order; a resume
        # whose values differ cannot skip `step_in_epoch` batches safely
        payload["data_order"] = {
            k: np.asarray(int(v)) for k, v in sorted(data_order.items())
        }
    if getattr(state, "rng", None) is not None:
        # the step PRNG key evolves with the state (split each step); without
        # it a mid-epoch resume replays stochastic paths (dropout/device-RRC)
        # from the initial key
        payload["rng"] = state.rng
    if getattr(state, "batch_stats", None) is not None:
        payload["batch_stats"] = state.batch_stats

    if async_save:
        ckptr = _async_checkpointer("epoch")
        ckptr.wait_until_finished()
        ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
    else:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()

    if save_most_recent:
        latest = os.path.abspath(os.path.join(checkpoint_dir, "epoch_latest"))
        if async_save:
            lckptr = _async_checkpointer("latest")
            lckptr.wait_until_finished()
            lckptr.save(latest, args=ocp.args.StandardSave(payload), force=True)
        else:
            ckptr.save(latest, payload, force=True)
            ckptr.wait_until_finished()
    if delete_previous:
        prev = os.path.join(checkpoint_dir, f"epoch_{epoch - 1}")
        if os.path.isdir(prev):
            import shutil

            if async_save:
                # the epoch_N write is still in flight in a background
                # thread; deleting epoch_{N-1} now would leave ZERO durable
                # checkpoints if the process dies before the write commits.
                # Durability beats overlap when pruning is requested.
                ckptr.wait_until_finished()
            shutil.rmtree(prev)
    logging.info("saved checkpoint %s%s", path, " (async)" if async_save else "")
    return path


def _metadata_template(md_tree) -> Any:
    """Zeros-template from an orbax metadata subtree (shape+dtype only)."""
    if isinstance(md_tree, dict):
        return {k: _metadata_template(v) for k, v in md_tree.items()}
    return np.zeros(md_tree.shape, md_tree.dtype)


def restore_checkpoint(
    path: str, state
) -> Tuple[Any, int, int, Dict[str, int]]:
    """Restore into the structure of `state`.

    Returns (state, start_epoch, step_in_epoch, data_order) — step_in_epoch
    > 0 means the checkpoint was a mid-epoch (preemption) save and
    `start_epoch` should be continued from that optimizer step rather than
    restarted; `data_order` holds the batch-order flags recorded at save time
    (empty for epoch-boundary or pre-round-3 checkpoints). The template is
    built from the checkpoint's OWN top-level keys (orbax requires an exact
    structure match), so layout evolution (step_in_epoch / rng / data_order
    added in round 3) restores without masking real errors behind a blanket
    retry: a genuinely mismatched params/opt_state tree still raises the
    orbax structure error directly."""
    import orbax.checkpoint as ocp

    if path == "latest":
        raise ValueError("resolve 'latest' with latest_checkpoint() first")
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    md = ckptr.metadata(path).item_metadata.tree
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(0),
    }
    for key in ("step_in_epoch", "data_order"):
        if key in md:
            template[key] = _metadata_template(md[key])
    if "rng" in md:
        # prefer the live state's rng leaf (keeps key dtype/impl); a state
        # without rng still restores the saved one into a metadata template
        template["rng"] = (
            state.rng if getattr(state, "rng", None) is not None
            else _metadata_template(md["rng"])
        )
    if "batch_stats" in md:
        if getattr(state, "batch_stats", None) is not None:
            template["batch_stats"] = state.batch_stats
        else:
            template["batch_stats"] = _metadata_template(md["batch_stats"])
            logging.warning(
                "checkpoint %s carries batch_stats but the current model "
                "tracks none; they are ignored", path,
            )
    elif getattr(state, "batch_stats", None) is not None:
        logging.warning(
            "checkpoint %s has no batch_stats; the model's initial BN "
            "statistics are kept", path,
        )
    restored = ckptr.restore(path, template)
    new_state = state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(restored["step"]),
    )
    if "rng" in restored and getattr(state, "rng", None) is not None:
        new_state = new_state.replace(rng=jax.numpy.asarray(restored["rng"]))
    if "batch_stats" in restored and getattr(state, "batch_stats", None) is not None:
        new_state = new_state.replace(batch_stats=restored["batch_stats"])
    data_order = {
        k: int(v) for k, v in restored.get("data_order", {}).items()
    }
    return (
        new_state,
        int(restored["epoch"]),
        int(restored.get("step_in_epoch", 0)),
        data_order,
    )


def export_torch_checkpoint(
    state, epoch: int, name: str, out_path: str
) -> str:
    """Write the reference's .pt layout (`main.py:940-948`) for interop."""
    import torch

    from ..models.convert import flax_params_to_torch_state_dict

    sd = flax_params_to_torch_state_dict(
        jax.tree.map(np.asarray, state.params["model"]),
        batch_stats=(
            jax.tree.map(np.asarray, state.batch_stats)
            if getattr(state, "batch_stats", None) is not None else None
        ),
    )
    torch.save({"epoch": epoch, "name": name, "state_dict": sd}, out_path)
    return out_path
