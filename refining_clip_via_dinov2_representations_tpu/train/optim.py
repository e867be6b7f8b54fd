"""Optimizer construction: param-group AdamW + tower locking as masks.

Reproduces the reference's 5-group optimizer (`main.py:538-656`) with optax:

  1. heads (text_projection / resnet attnpool / non-visual "proj") —
     lr `head_lr` (1e-4), wd 0          (`main.py:549-561`)
  2. logit_scale — lr `logit_scale_lr` (1e-6), wd 0   (`main.py:563-574`)
  3. visual.layer4 / layer3 (ResNet) — lr 2e-5 / 1e-5 (`main.py:577-601`)
  4. unlocked text blocks + token/positional embeddings — lr `text_lr` (5e-5)
     (`main.py:603-638`). QUIRK KEPT: the reference's substring match
     "positional_embedding" also catches the *visual* positional embedding,
     so it trains at text_lr; mirrored here for parity.
  5. everything else — base lr, wd     (`main.py:640-648`)

Plus a 'dino_head' group: the DINO projection head is a real optimized
subtree here (reference bug: never optimized — SURVEY §2.2); it joins the
heads group unless `freeze_projection` is set.

Locking (`lock_image_tower`/`lock_text_tower`) becomes a 'frozen' label with
`optax.set_to_zero` — the JAX analogue of requires_grad=False.

Note: the reference defines an ln/bias/no-wd `exclude` predicate but never
uses it in the grouped path — wd applies uniformly inside groups 3-5. Kept.
"""

from __future__ import annotations

import dataclasses
import logging
import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .scheduler import Schedule


@dataclasses.dataclass
class OptimCfg:
    lr: float = 5.0e-4
    beta1: float = 0.9
    beta2: float = 0.98
    eps: float = 1.0e-6
    wd: float = 0.2
    head_lr: float = 1.0e-4
    logit_scale_lr: float = 1.0e-6
    resnet_lr4: float = 2.0e-5
    resnet_lr3: float = 1.0e-5
    text_lr: float = 5.0e-5
    grad_clip_norm: Optional[float] = None
    # optimizer family (reference `--opt`: 'adamw' or 'timm/{name}',
    # params.py:742-746). The TPU-native zoo is optax: adamw (default),
    # lion, lamb, adafactor (factored second moment — the memory lever for
    # giant single-chip configs), sgd. 'timm/{name}' maps onto the optax
    # optimizer of the same name.
    opt: str = "adamw"
    # locking (reference --lock-image/--lock-text flag family)
    lock_image: bool = False
    lock_image_unlocked_groups: int = 0
    lock_text: bool = False
    lock_text_unlocked_layers: int = 0
    # which reference text-tower semantics to reproduce (main.py selects by
    # the model config's custom_text flag):
    # * locking — the CLIP class ALWAYS freezes the non-block text params
    #   (embeddings/ln_final/text_projection, `model.py:376-398`) while
    #   CustomTextCLIP's TextTransformer.lock frees them unless
    #   unlocked_layers == 0 (`transformer.py:1102-1111`);
    # * grouping — the reference's unlocked-text-block loop iterates
    #   `model.transformer.resblocks` (`main.py:610-620`), which only the
    #   CLIP class has; for CustomTextCLIP/CoCa the loop never runs, so
    #   lock_text_unlocked_layers moves NO blocks into the text group.
    text_tower_style: str = "clip"  # "clip" | "custom_text"
    freeze_projection: bool = False  # bug-compatible: don't train the DINO head
    flatten_group_lrs: bool = False  # bug-compatible: scheduler overrides group LRs
    use_param_groups: bool = True    # False → single-group AdamW at base lr
    # dtype of AdamW's first moment (m). "bfloat16" halves its HBM footprint
    # (one params-worth saved — 3.9 GiB on ViT-H-14) for a bf16 rounding of
    # the EMA; the second moment (v) always stays fp32 (optax exposes only
    # mu_dtype, and v's dynamic range genuinely needs fp32).
    mu_dtype: Optional[str] = None


GROUP_WD = {
    "heads": 0.0,
    "logit_scale": 0.0,
    "resnet_l4": None,  # None → cfg.wd
    "resnet_l3": None,
    "text": None,
    "default": None,
}


def _path_str(path: Tuple) -> str:
    return "/".join(p.key if hasattr(p, "key") else str(p) for p in path)


def _text_block_index(path: str) -> Optional[int]:
    m = re.search(r"^model/text/transformer/resblocks_(\d+)/", path)
    return int(m.group(1)) if m else None


def _vision_block_index(path: str) -> Optional[int]:
    m = re.search(r"^model/visual/transformer/resblocks_(\d+)/", path)
    return int(m.group(1)) if m else None


def label_params(
    params: Dict[str, Any],
    cfg: OptimCfg,
    text_layers: Optional[int] = None,
    vision_layers: Optional[int] = None,
) -> Dict[str, Any]:
    """Assign each leaf a group label. `params` is the train tree:
    {"model": clip_params, "dino_head": head_params (optional)}."""
    # count ONLY resblocks_* children: CoCa checkpoints place cross_attn_*
    # siblings under the same transformer dict, which would inflate the
    # layer count and break the lock-unlock threshold (r3 review)
    if text_layers is None:
        tf = params.get("model", {}).get("text", {}).get("transformer", {})
        text_layers = sum(1 for k in tf if str(k).startswith("resblocks"))
    if vision_layers is None:
        vf = params.get("model", {}).get("visual", {}).get("transformer", {})
        vision_layers = (
            sum(1 for k in vf if str(k).startswith("resblocks")) if vf else 0
        )

    n_unlock_text = cfg.lock_text_unlocked_layers
    text_start = max(0, text_layers - n_unlock_text)

    def label_one(path, value) -> str:
        p = _path_str(path)

        # ---- frozen by tower locking ----
        if cfg.lock_image and p.startswith("model/visual/"):
            vb = _vision_block_index(p)
            g = cfg.lock_image_unlocked_groups
            if g <= 0:
                return "frozen"
            # unlocked: last g blocks + ln_post + proj. NOTE: these are the
            # FORK's patched lock semantics (`transformer.py:709-739`,
            # installed by `patch_vit_lock`, ref main.py:74-95) — NOT
            # upstream open_clip's [stem, blocks[:-1], last+ln_post, proj]
            # group ladder. Parity target is the fork.
            unlocked = (
                (vb is not None and vb >= vision_layers - g)
                or p.startswith("model/visual/ln_post")
                or p == "model/visual/proj"
            )
            if not unlocked:
                return "frozen"
        if cfg.lock_text and p.startswith("model/text/"):
            tb = _text_block_index(p)
            if tb is not None:
                if tb < text_layers - cfg.lock_text_unlocked_layers:
                    return "frozen"
            elif (
                cfg.text_tower_style == "clip"
                or cfg.lock_text_unlocked_layers == 0
            ):
                # non-block text params (embeddings/ln_final/projection):
                # CLIP.lock_text_tower always freezes them
                # (`model.py:376-398`); TextTransformer.lock only at full
                # lock (`transformer.py:1102-1111`)
                return "frozen"

        if p.startswith("dino_head/"):
            return "frozen" if cfg.freeze_projection else "heads"

        # ---- group 1: heads ----
        if "text_projection" in p:
            return "heads"
        if "visual/attnpool" in p:
            return "heads"
        # reference main.py:552-553: ANY "proj" param outside the visual
        # tower joins the heads group — this catches every text-tower
        # attention in_proj/out_proj and mlp c_proj weight (lr=head_lr,
        # wd=0), which is a large fraction of the text tower.
        if "proj" in p and "visual" not in p:
            return "heads"

        # ---- group 2: logit scale ----
        if "logit_scale" in p:
            return "logit_scale"

        # ---- group 3: resnet stages ----
        if p.startswith("model/visual/layer4"):
            return "resnet_l4"
        if p.startswith("model/visual/layer3"):
            return "resnet_l3"

        # ---- group 4: text ----
        # the reference's unlocked-block loop only exists for the CLIP class
        # (it walks `model.transformer.resblocks`, absent on
        # CustomTextCLIP/CoCa — `main.py:610-612` hasattr guard)
        if cfg.text_tower_style == "clip":
            tb = _text_block_index(p)
            if tb is not None and tb >= text_start and n_unlock_text > 0:
                return "text"
            # QUIRK KEPT (reference main.py:615-620): the block selector is
            # the substring f"transformer.resblocks.{i}." — which ALSO
            # matches "visual.transformer.resblocks.{i}.", so visual blocks
            # whose index falls in the unlocked TEXT range join the text
            # group (at text_lr).
            vb = _vision_block_index(p)
            if (
                vb is not None and n_unlock_text > 0
                and text_start <= vb < text_layers
            ):
                return "text"
        if "token_embedding" in p or "positional_embedding" in p:
            return "text"  # note: catches visual pos-embed too (quirk kept)

        return "default"

    return jax.tree_util.tree_map_with_path(label_one, params)


def group_base_lrs(cfg: OptimCfg) -> Dict[str, float]:
    base = cfg.lr if cfg.lr is not None else 5e-5
    return {
        "heads": cfg.head_lr,
        "logit_scale": cfg.logit_scale_lr,
        "resnet_l4": cfg.resnet_lr4,
        "resnet_l3": cfg.resnet_lr3,
        "text": cfg.text_lr,
        "default": base,
    }


def make_inner_optimizer(
    cfg: OptimCfg, learning_rate, wd: float
) -> optax.GradientTransformation:
    """One optimizer instance for one param group.

    Implements the reference's `--opt` surface (`params.py:742-746`:
    'adamw' or any timm optimizer as 'timm/{name}') with optax equivalents.
    betas/eps come from the CLI (`--beta1/--beta2/--eps`) for every family;
    adafactor keeps its own eps (1e-30) and update-clipping (1.0) — they are
    part of its stability recipe — and uses beta1 as the momentum decay.
    """
    name = (cfg.opt or "adamw").strip().lower()
    if name.startswith("timm/"):
        name = name[len("timm/"):]
    mu = cfg.mu_dtype
    if name == "adamw":
        return optax.adamw(
            learning_rate=learning_rate, b1=cfg.beta1, b2=cfg.beta2,
            eps=cfg.eps, weight_decay=wd, mu_dtype=mu,
        )
    if name == "lion":
        return optax.lion(
            learning_rate=learning_rate, b1=cfg.beta1, b2=cfg.beta2,
            weight_decay=wd, mu_dtype=mu,
        )
    if name == "lamb":
        if mu is not None:
            raise ValueError(
                "--adam-mu-dtype is not supported with --opt lamb "
                "(optax.lamb keeps fp32 moments); unset one of them"
            )
        return optax.lamb(
            learning_rate=learning_rate, b1=cfg.beta1, b2=cfg.beta2,
            eps=cfg.eps, weight_decay=wd,
        )
    if name == "adafactor":
        # Factored second moment: v becomes one row + one column vector per
        # 2-D leaf (O(n+m) instead of O(n*m)) — saves a params-worth of HBM
        # vs AdamW's full v (3.9 GiB on ViT-H-14), which moves the
        # single-chip memory wall for giant students.
        #
        # Weight decay is composed OUTSIDE optax.adafactor: its own
        # `weight_decay_rate` is appended AFTER the lr scaling, i.e. a RAW
        # multiplicative p -= rate*p per step (0.2/step would destroy the
        # params). This chain reproduces AdamW's decoupled decay
        # update = -lr * (direction + wd * p).
        af = optax.adafactor(
            learning_rate=None,  # lr applied at the end of the chain
            momentum=cfg.beta1,
            dtype_momentum=(mu or jnp.float32),
            multiply_by_parameter_scale=False,
            weight_decay_rate=None,
            factored=True,
        )
        return optax.chain(
            af,
            optax.scale(-1.0),  # undo adafactor's sign flip; re-applied below
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_learning_rate(learning_rate),
        )
    if name in ("sgd", "sgdw", "momentum"):
        return optax.chain(
            optax.trace(decay=cfg.beta1),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(learning_rate),
        )
    raise ValueError(
        f"unknown --opt {cfg.opt!r}: supported are 'adamw', 'lion', 'lamb', "
        "'adafactor', 'sgd' (optionally prefixed 'timm/' for reference-CLI "
        "compatibility)"
    )


def build_optimizer(
    params: Dict[str, Any],
    cfg: OptimCfg,
    schedule: Schedule,
    base_lr: Optional[float] = None,
) -> Tuple[optax.GradientTransformation, Dict[str, Any]]:
    """AdamW with per-group lr/wd, global grad-norm clipping, and frozen
    masking. Returns (tx, labels)."""
    base_lr = base_lr if base_lr is not None else (cfg.lr if cfg.lr is not None else 5e-5)
    labels = label_params(params, cfg)

    def group_tx(group: str) -> optax.GradientTransformation:
        g_lr = group_base_lrs(cfg)[group]
        wd = GROUP_WD[group] if GROUP_WD[group] is not None else cfg.wd

        if cfg.flatten_group_lrs:
            g_sched = schedule  # reference quirk: one lr for all groups
        else:
            ratio = g_lr / base_lr if base_lr > 0 else 1.0

            def g_sched(step, _ratio=ratio):
                return schedule(step) * _ratio

        return make_inner_optimizer(cfg, g_sched, wd)

    if not cfg.use_param_groups:
        tx = make_inner_optimizer(cfg, schedule, cfg.wd)
        # collapse per-group LRs but KEEP tower-lock freezing — the
        # reference locks via requires_grad on the model, independent of
        # how the optimizer groups params (r3 review: --no-param-groups
        # --lock-image silently trained the locked tower)
        labels = jax.tree.map(
            lambda lbl: "frozen" if lbl == "frozen" else "default", labels
        )
        transforms = {"default": tx, "frozen": optax.set_to_zero()}
    else:
        transforms = {g: group_tx(g) for g in GROUP_WD}
        transforms["frozen"] = optax.set_to_zero()

    tx = optax.multi_transform(transforms, labels)
    if cfg.grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)

    counts: Dict[str, int] = {}
    sizes: Dict[str, int] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        lbl = _lookup_label(labels, path)
        counts[lbl] = counts.get(lbl, 0) + 1
        sizes[lbl] = sizes.get(lbl, 0) + int(leaf.size)
    logging.info("optimizer groups: %s (param counts %s)", dict(sizes), dict(counts))
    return tx, labels


def _lookup_label(labels, path):
    node = labels
    for p in path:
        key = p.key if hasattr(p, "key") else str(p)
        node = node[key]
    return node


# ---------------------------------------------------------------------------
# Fused per-group AdamW: flatten each group's leaves into one vector so the
# optimizer runs a handful of large elementwise kernels instead of thousands
# of per-tensor ops. Numerics are identical to the unfused path for equal
# group hyperparams.
#
# MEASURED (v5e, ViT-B/16 @ batch 96): 134.5 ms/step fused vs 121.7 ms with
# the multi_transform path — on TPU the per-tensor ops live inside one XLA
# program, so there is no per-kernel launch cost to save and the gather/
# scatter copies dominate. Kept as an option for models whose param count
# dwarfs their activation traffic; NOT the default.
# ---------------------------------------------------------------------------

def build_fused_optimizer(
    params: Dict[str, Any],
    cfg: OptimCfg,
    schedule: Schedule,
    base_lr: Optional[float] = None,
) -> Tuple[optax.GradientTransformation, Dict[str, Any]]:
    import numpy as np

    if (cfg.opt or "adamw").strip().lower().removeprefix("timm/") != "adamw":
        raise ValueError("build_fused_optimizer implements AdamW only; "
                         f"--opt {cfg.opt!r} must use build_optimizer")
    base_lr = base_lr if base_lr is not None else (cfg.lr if cfg.lr is not None else 5e-5)
    labels = label_params(params, cfg)

    leaves_with_path = jax.tree_util.tree_leaves_with_path(params)
    treedef = jax.tree_util.tree_structure(params)
    leaf_labels = [_lookup_label(labels, p) for p, _ in leaves_with_path]
    groups = sorted({l for l in leaf_labels if l != "frozen"})
    group_slots = {g: [i for i, l in enumerate(leaf_labels) if l == g] for g in groups}
    leaf_sizes = [int(np.prod(v.shape)) for _, v in leaves_with_path]
    lrs = group_base_lrs(cfg)

    def _flatten_group(leaves, slots):
        return jnp.concatenate([leaves[i].ravel().astype(jnp.float32) for i in slots])

    def init_fn(params):
        leaves = jax.tree_util.tree_leaves(params)
        return {
            g: {
                "m": jnp.zeros(sum(leaf_sizes[i] for i in group_slots[g]), jnp.float32),
                "v": jnp.zeros(sum(leaf_sizes[i] for i in group_slots[g]), jnp.float32),
            }
            for g in groups
        } | {"count": jnp.zeros((), jnp.int32)}

    def update_fn(grads, state, params):
        assert params is not None, "fused adamw requires params (weight decay)"
        g_leaves = jax.tree_util.tree_leaves(grads)
        p_leaves = jax.tree_util.tree_leaves(params)
        count = state["count"] + 1
        count_f = count.astype(jnp.float32)
        new_state = {"count": count}
        updates_flat: Dict[int, jnp.ndarray] = {}

        for g in groups:
            slots = group_slots[g]
            gv = _flatten_group(g_leaves, slots)
            pv = _flatten_group(p_leaves, slots)
            m = state[g]["m"] * cfg.beta1 + gv * (1 - cfg.beta1)
            v = state[g]["v"] * cfg.beta2 + jnp.square(gv) * (1 - cfg.beta2)
            mhat = m / (1 - cfg.beta1 ** count_f)
            vhat = v / (1 - cfg.beta2 ** count_f)
            if cfg.flatten_group_lrs:
                lr = schedule(count - 1)
            else:
                lr = schedule(count - 1) * (lrs[g] / base_lr if base_lr > 0 else 1.0)
            wd = GROUP_WD[g] if GROUP_WD[g] is not None else cfg.wd
            upd = -lr * (mhat / (jnp.sqrt(vhat) + cfg.eps) + wd * pv)
            new_state[g] = {"m": m, "v": v}
            off = 0
            for i in slots:
                updates_flat[i] = upd[off : off + leaf_sizes[i]]
                off += leaf_sizes[i]

        out_leaves = []
        for i, (path, leaf) in enumerate(leaves_with_path):
            if i in updates_flat:
                out_leaves.append(
                    updates_flat[i].reshape(leaf.shape).astype(leaf.dtype)
                )
            else:  # frozen
                out_leaves.append(jnp.zeros_like(leaf))
        updates = jax.tree_util.tree_unflatten(treedef, out_leaves)
        return updates, new_state

    tx = optax.GradientTransformation(init_fn, update_fn)
    if cfg.grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx, labels
