"""Production optimizer-path parity vs the torch reference (VERDICT r3 #1).

Two halves:

1. **Leaf-level grouping parity** — build a tiny torch CLIP, run the
   reference's ACTUAL param-group construction logic (the inline block at
   `/root/reference/src/open_clip_train/main.py:549-648`, exec'd verbatim
   from its source so the oracle cannot drift from the code), and assert
   `train/optim.py:label_params` + `group_base_lrs`/`GROUP_WD` assign the
   identical (lr, wd, trainable) triple to EVERY parameter leaf — including
   the lock configurations (the fork's `patch_vit_lock`, reference
   `main.py:74-95`, and `lock_text_tower`).

2. **50-step production overlay** — drive the real
   `make_train_step(StepCfg)` + `build_optimizer` (5-group multi_transform)
   + `make_schedule` + in-graph λ-warm-up + post-update logit clamp against
   a reference loop built from its actual pieces: the exec'd grouped AdamW,
   `scheduler.cosine_lr` (whose `assign_learning_rate` flattens every group
   LR each step — the quirk `OptimCfg.flatten_group_lrs` reproduces),
   `train.make_effective_args` λ-warm-up, grad clipping, and
   `logit_scale.clamp_(0, ln 100)` (`train.py:227,341,420,425`).

The torch-name → flax-path correspondence is established mechanically: each
torch tensor is filled with a unique constant and pushed through
`models/convert.py`, so the mapping is exactly what the production converter
does, not a hand-written table.
"""

import math
import textwrap
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.models import (
    build_model,
    convert_clip_state_dict,
    convert_clip_variables,
    parse_model_cfg,
)
from refining_clip_via_dinov2_representations_tpu.train.optim import (
    GROUP_WD,
    OptimCfg,
    build_optimizer,
    group_base_lrs,
    label_params,
)
from tests.ref_loader import load_ref, reference_available

torch = pytest.importorskip("torch")
if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)

REF_MAIN = "/root/reference/src/open_clip_train/main.py"

TINY_VIT = dict(
    embed_dim=32,
    vision_cfg=dict(image_size=16, patch_size=8, width=32, layers=3, head_width=16),
    text_cfg=dict(context_length=12, vocab_size=64, width=32, heads=4, layers=3),
)
TINY_RN = dict(
    embed_dim=64,
    vision_cfg=dict(image_size=32, layers=[1, 1, 1, 1], width=16, head_width=64),
    text_cfg=dict(context_length=16, vocab_size=128, width=32, heads=4, layers=2),
)


def _exec_ref_region(start_marker, end_marker, namespace):
    """Exec a region of the reference main.py verbatim in `namespace`."""
    src = open(REF_MAIN).read()
    start = src.index(start_marker)
    start = src.rfind("\n", 0, start) + 1
    end = src.index(end_marker)
    exec(textwrap.dedent(src[start:end]), namespace)
    return namespace


def _ref_param_groups(model, args):
    """Run the reference's inline param-group construction
    (`main.py:549-648`) on `model` and return its `param_groups` list."""
    ns = _exec_ref_region(
        "named_parameters = list(model.named_parameters())",
        "# === FINALLY: Create the optimizer ===",
        {"model": model, "args": args, "torch": torch},
    )
    return ns["param_groups"]


def _ref_patch_vit_lock():
    """Load the fork's `patch_vit_lock` (`main.py:74-95`) from source."""
    ns = _exec_ref_region(
        "def patch_vit_lock(vit):", "def main(args):", {"torch": torch}
    )
    return ns["patch_vit_lock"]


def _build_ref_clip(cfg_dict, seed=0):
    ref_model_mod = load_ref("model")
    torch.manual_seed(seed)
    return ref_model_mod.CLIP(
        embed_dim=cfg_dict["embed_dim"],
        vision_cfg=ref_model_mod.CLIPVisionCfg(**cfg_dict["vision_cfg"]),
        text_cfg=ref_model_mod.CLIPTextCfg(**cfg_dict["text_cfg"]),
    )


def _torch_to_flax_path_map(ref_model):
    """Mechanical torch-name → flax-path map: fill each state_dict tensor
    with a unique constant, convert through the production converter, read
    the constants back out of the flax params tree."""
    sd = ref_model.state_dict()
    keys = list(sd)
    fill = {k: torch.full_like(sd[k].float(), float(i + 1)) for i, k in enumerate(sd)}
    variables = convert_clip_variables(fill)
    mapping = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables["params"]):
        p = "/".join(x.key for x in path)
        vals = np.unique(np.asarray(leaf, np.float64))
        assert len(vals) == 1 and float(vals[0]).is_integer(), (
            f"flax leaf {p} mixes torch tensors — fill-mapping broke: {vals[:5]}"
        )
        mapping[p] = keys[int(vals[0]) - 1]
    return mapping


def _assert_leaf_parity(ref, args, ocfg):
    """Shared contract: every parameter's (lr, wd, trainable) triple from
    the exec'd reference grouping must equal ours, over the mechanical
    torch-name→flax-path map."""
    param_groups = _ref_param_groups(ref, args)
    id2lw = {
        id(p): (g["lr"], g["weight_decay"])
        for g in param_groups for p in g["params"]
    }
    ref_triples = {}
    for n, p in ref.named_parameters():
        if not p.requires_grad:
            ref_triples[n] = "frozen"
        else:
            assert id(p) in id2lw, f"reference left trainable {n} unassigned"
            ref_triples[n] = id2lw[id(p)]

    params = convert_clip_variables(
        {k: v.float() for k, v in ref.state_dict().items()}
    )["params"]
    labels = label_params({"model": params}, ocfg)
    lrs = group_base_lrs(ocfg)
    name_map = _torch_to_flax_path_map(ref)

    seen, mismatches = set(), []
    for path, label in jax.tree_util.tree_leaves_with_path(labels["model"]):
        p = "/".join(x.key for x in path)
        torch_name = name_map[p]
        want = ref_triples.get(torch_name)
        if want is None:
            continue  # buffer (attn_mask / BN stats) — not an optimizer leaf
        got = (
            "frozen" if label == "frozen"
            else (lrs[label],
                  GROUP_WD[label] if GROUP_WD[label] is not None else ocfg.wd)
        )
        seen.add(torch_name)  # one torch param may split into several leaves
        if got != want:
            mismatches.append(f"{torch_name} ({p}): ref={want} ours={got} [{label}]")
    assert not mismatches, "\n".join(mismatches)
    assert seen == {n for n, _ in ref.named_parameters()}, (
        "some torch parameters never reached the flax tree"
    )


_GROUP_CASES = [
    # (id, cfg_dict, lock_image_groups, lock_text, lock_text_layers)
    ("vit-default", TINY_VIT, None, False, 0),
    # grouping uses lock_text_unlocked_layers even WITHOUT --lock-text
    # (`main.py:613-616` reads it unconditionally)
    ("vit-text-unlock-2", TINY_VIT, None, False, 2),
    ("vit-lock-image-1", TINY_VIT, 1, False, 0),
    ("vit-lock-text-full", TINY_VIT, None, True, 0),
    ("vit-lock-text-1", TINY_VIT, None, True, 1),
    ("vit-both-locks", TINY_VIT, 2, True, 1),
    ("resnet-default", TINY_RN, None, False, 0),
]


@pytest.mark.parametrize(
    "case", _GROUP_CASES, ids=[c[0] for c in _GROUP_CASES]
)
def test_param_group_leaf_parity(case):
    _, cfg_dict, lock_img_groups, lock_text, lock_text_layers = case
    ref = _build_ref_clip(cfg_dict)

    # ---- apply the reference lock path exactly as main() does ----
    if hasattr(ref, "visual") and hasattr(ref.visual, "transformer"):
        _ref_patch_vit_lock()(ref.visual)  # `main.py:382-383`
    if lock_img_groups is not None:
        ref.lock_image_tower(
            unlocked_groups=lock_img_groups, freeze_bn_stats=False
        )
    if lock_text:
        ref.lock_text_tower(
            unlocked_layers=lock_text_layers, freeze_layer_norm=True
        )

    args = SimpleNamespace(
        lr=1e-3, wd=0.1, head_lr=1e-4, logit_scale_lr=1e-6,
        resnet_lr4=2e-5, resnet_lr3=1e-5, text_lr=5e-5,
        lock_text_unlocked_layers=lock_text_layers,
    )
    ocfg = OptimCfg(
        lr=args.lr, wd=args.wd, head_lr=args.head_lr,
        logit_scale_lr=args.logit_scale_lr, resnet_lr4=args.resnet_lr4,
        resnet_lr3=args.resnet_lr3, text_lr=args.text_lr,
        lock_image=lock_img_groups is not None,
        lock_image_unlocked_groups=lock_img_groups or 0,
        lock_text=lock_text,
        lock_text_unlocked_layers=lock_text_layers,
    )
    _assert_leaf_parity(ref, args, ocfg)


TINY_COCA = {
    "embed_dim": 32,
    "vision_cfg": {
        "image_size": 32, "patch_size": 8, "width": 32, "layers": 2,
        "head_width": 16, "attentional_pool": True, "attn_pooler_queries": 8,
        "attn_pooler_heads": 2, "output_tokens": True,
    },
    "text_cfg": {
        "context_length": 12, "vocab_size": 64, "width": 32, "heads": 4,
        "layers": 2, "embed_cls": True, "output_tokens": True,
    },
    "multimodal_cfg": {
        "context_length": 12, "vocab_size": 64, "width": 32, "heads": 4,
        "layers": 2, "attn_pooler_heads": 2,
    },
    "custom_text": True,
}


@pytest.mark.parametrize("unlocked_text_layers", [0, 2])
def test_param_group_leaf_parity_coca(unlocked_text_layers):
    """CoCa exercises the name patterns the CLIP cases can't: a text_decoder
    with interleaved self/cross blocks (every *proj* lands in the heads
    group), attentional pooler, cls_emb — and the CustomTextCLIP-family
    quirk that `lock_text_unlocked_layers` moves NO blocks into the text
    group because the reference's block loop walks `model.transformer`,
    which CoCa lacks (`main.py:610-620`)."""
    coca_mod = load_ref("coca_model")
    torch.manual_seed(0)
    ref = coca_mod.CoCa(
        embed_dim=32,
        multimodal_cfg=dict(TINY_COCA["multimodal_cfg"]),
        text_cfg=dict(TINY_COCA["text_cfg"]),
        vision_cfg=dict(TINY_COCA["vision_cfg"]),
    )
    # reference quirk: this tensor is allocated with torch.empty and never
    # initialized — give it sane values so the fill-map roundtrip is clean
    with torch.no_grad():
        ref.text_decoder.text_projection.normal_(std=32 ** -0.5)

    args = SimpleNamespace(
        lr=1e-3, wd=0.1, head_lr=1e-4, logit_scale_lr=1e-6,
        resnet_lr4=2e-5, resnet_lr3=1e-5, text_lr=5e-5,
        lock_text_unlocked_layers=unlocked_text_layers,
    )
    ocfg = OptimCfg(
        lr=args.lr, wd=args.wd, head_lr=args.head_lr,
        logit_scale_lr=args.logit_scale_lr, text_lr=args.text_lr,
        lock_text_unlocked_layers=unlocked_text_layers,
        text_tower_style="custom_text",  # what main.py selects for CoCa
    )
    _assert_leaf_parity(ref, args, ocfg)


def test_param_group_wd_and_lr_values_cover_all_groups():
    """The ViT case must actually exercise heads/logit_scale/text/default and
    the ResNet case layer3/layer4/attnpool — guard against a silently
    degenerate parametrization."""
    ref = _build_ref_clip(TINY_RN)
    args = SimpleNamespace(
        lr=1e-3, wd=0.1, head_lr=1e-4, logit_scale_lr=1e-6,
        resnet_lr4=2e-5, resnet_lr3=1e-5, text_lr=5e-5,
        lock_text_unlocked_layers=0,
    )
    lrs = {g["lr"] for g in _ref_param_groups(ref, args)}
    assert {1e-4, 1e-6, 2e-5, 1e-5, 5e-5, 1e-3} <= lrs


# ---------------------------------------------------------------------------
# 50-step overlay through the PRODUCTION step + optimizer
# ---------------------------------------------------------------------------


def _ref_grouped_adamw(ref, args):
    param_groups = _ref_param_groups(ref, args)
    return torch.optim.AdamW(
        param_groups,
        lr=args.lr if args.lr is not None else 5e-5,
        betas=(args.beta1, args.beta2),
        eps=args.eps,
    )


def _overlay(use_projection, grad_clip_norm, n_steps=50):
    """One overlay leg; returns (torch_curve, jax_curve)."""
    from refining_clip_via_dinov2_representations_tpu.losses import DinoLossCfg
    from refining_clip_via_dinov2_representations_tpu.losses.dino import (
        DinoProjectionHead,
    )
    from refining_clip_via_dinov2_representations_tpu.train.scheduler import (
        make_schedule,
    )
    from refining_clip_via_dinov2_representations_tpu.train.step import (
        StepCfg,
        create_train_state,
        make_train_step,
    )
    from tests.test_losses import _torch_head_to_flax

    ref_loss_mod = load_ref("loss")
    ref_sched_mod = __import__("tests.ref_loader", fromlist=["load_ref_train"])
    ref_sched = ref_sched_mod.load_ref_train("scheduler")
    ref_train = ref_sched_mod.load_ref_train("train")

    ref = _build_ref_clip(TINY_VIT, seed=5)
    ref.train()

    base_lr, wd, b1, b2, eps = 1e-3, 0.1, 0.9, 0.98, 1e-6
    warmup, lam_soft, dino_dim, batch = 10, 0.5, 24, 8
    args = SimpleNamespace(
        lr=base_lr, wd=wd, beta1=b1, beta2=b2, eps=eps,
        head_lr=1e-4, logit_scale_lr=1e-6, resnet_lr4=2e-5, resnet_lr3=1e-5,
        text_lr=5e-5, lock_text_unlocked_layers=0,
        # λ-warm-up args for make_effective_args (`train.py:120-141`)
        enable_warmup_dino_hyperparams=True, warmup=warmup,
        have_dino_for_batch=True,
        # loss args
        use_projection=use_projection, projection_type="mlp",
        use_layernorm=False, residual_projection=False, residual_alpha=None,
        lambda_original=1.0, lambda_soft=lam_soft, soft_mode="kl_teacher",
        teacher_temp=0.15, soft_dino_to_text=False, text_lambda=0.0,
        text_student_temp=0.05, lambda_weighted=0.3, rho=0.1, c_clip=1.0,
        weight_text_symmetry=True,
    )
    t_opt = _ref_grouped_adamw(ref, args)
    # the reference scheduler overwrites EVERY group's lr each step
    # (`scheduler.py:4-6` assign_learning_rate) — the flatten_group_lrs quirk
    t_sched = ref_sched.cosine_lr(t_opt, base_lr, warmup, n_steps, lr_min=0.0)
    t_loss_fn = ref_loss_mod.ClipLossWithDINOEnhancements()

    rng = np.random.default_rng(99)
    batches = [
        (
            rng.normal(size=(batch, 3, 16, 16)).astype(np.float32),
            rng.integers(1, 63, size=(batch, 12)).astype(np.int64),
            rng.normal(size=(batch, dino_dim)).astype(np.float32),
        )
        for _ in range(n_steps)
    ]

    # ---- our production stack ----
    model = build_model(parse_model_cfg(TINY_VIT))
    model_params = jax.tree.map(jnp.asarray, convert_clip_state_dict(ref.state_dict()))

    head = head_params = None
    if use_projection:
        # reference quirk: the head is lazily created AFTER the optimizer, so
        # it gets gradients but is never updated (`loss.py:214-238`). Trigger
        # its creation, mirror its weights, keep ours frozen via the
        # bug-compatible --freeze-projection flag.
        with torch.no_grad():
            f0, t0, s0 = ref(
                torch.from_numpy(batches[0][0]), torch.from_numpy(batches[0][1])
            )
            t_loss_fn(
                f0, t0, s0, torch.from_numpy(batches[0][2]),
                args=ref_train.make_effective_args(args, 0), output_dict=True,
            )
        head = DinoProjectionHead(dino_dim=dino_dim, projection_type="mlp")
        head_params = jax.tree.map(
            jnp.asarray, _torch_head_to_flax(t_loss_fn, "mlp", False)
        )

    ocfg = OptimCfg(
        lr=base_lr, beta1=b1, beta2=b2, eps=eps, wd=wd,
        head_lr=args.head_lr, logit_scale_lr=args.logit_scale_lr,
        resnet_lr4=args.resnet_lr4, resnet_lr3=args.resnet_lr3,
        text_lr=args.text_lr, grad_clip_norm=grad_clip_norm,
        flatten_group_lrs=True,          # the assign_learning_rate quirk
        freeze_projection=use_projection,  # head frozen, like the reference
    )
    schedule = make_schedule(
        SimpleNamespace(lr_scheduler="cosine", warmup=warmup, lr_min=0.0),
        base_lr, n_steps,
    )
    params_tree = {"model": model_params}
    if head_params is not None:
        params_tree["dino_head"] = head_params
    tx, _ = build_optimizer(params_tree, ocfg, schedule)

    dcfg = DinoLossCfg(
        lambda_original=1.0, lambda_soft=lam_soft, soft_mode="kl_teacher",
        teacher_temp=0.15, lambda_weighted=0.3, rho=0.1, c_clip=1.0,
        weight_text_symmetry=True, use_projection=use_projection,
        projection_type="mlp",
    )
    scfg = StepCfg(
        loss_type="dino", dino=dcfg,
        enable_warmup_dino_hyperparams=True, warmup=warmup,
    )
    train_step = make_train_step(model, tx, scfg, head=head)
    state = create_train_state(
        jax.random.PRNGKey(0), model_params, tx, head_params=head_params
    )

    t_curve, j_curve = [], []
    for i, (images, texts, dino) in enumerate(batches):
        # ---- reference loop, its actual pieces (`train.py:218-425`) ----
        t_sched(i)
        t_opt.zero_grad()
        img_f, txt_f, scale = ref(torch.from_numpy(images), torch.from_numpy(texts))
        eff = ref_train.make_effective_args(args, i)
        t_loss = t_loss_fn(
            img_f, txt_f, scale, torch.from_numpy(dino), args=eff,
            output_dict=True,
        )["total_loss"]
        t_loss.backward()
        if grad_clip_norm is not None:
            torch.nn.utils.clip_grad_norm_(
                ref.parameters(), grad_clip_norm, norm_type=2.0
            )
        t_opt.step()
        with torch.no_grad():
            ref.logit_scale.clamp_(0, math.log(100))
        t_curve.append(float(t_loss.detach()))

        # ---- our production step (schedule/warmup/clamp all in-graph) ----
        state, metrics = train_step(
            state,
            {
                "images": jnp.asarray(images.transpose(0, 2, 3, 1)),
                "texts": jnp.asarray(texts.astype(np.int32)),
                "dino_features": jnp.asarray(dino),
            },
        )
        j_curve.append(float(metrics["total_loss"]))

    return np.asarray(t_curve), np.asarray(j_curve)


def _assert_curves_track(t_curve, j_curve):
    np.testing.assert_allclose(j_curve[:5], t_curve[:5], atol=1e-3)
    band = np.abs(j_curve - t_curve)
    assert band.max() < 0.05, f"curves diverged: max |d|={band.max():.4f}"
    assert np.corrcoef(t_curve, j_curve)[0, 1] > 0.999
    assert t_curve[-5:].mean() < t_curve[:5].mean()
    assert j_curve[-5:].mean() < j_curve[:5].mean()


def test_fifty_step_production_step_param_group_overlay():
    """make_train_step + 5-group build_optimizer + cosine schedule + in-graph
    λ-warm-up + logit clamp vs the reference's grouped AdamW +
    assign_learning_rate + make_effective_args + clamp_ — with the frozen
    projection head in the loss path on both sides."""
    t_curve, j_curve = _overlay(use_projection=True, grad_clip_norm=None)
    _assert_curves_track(t_curve, j_curve)


def test_fifty_step_production_overlay_with_grad_clip():
    """Same production path with --grad-clip-norm exercised
    (`train.py:417-420` clip_grad_norm_ vs optax.clip_by_global_norm). The
    clip threshold is set low enough to bind on real early-step grads."""
    t_curve, j_curve = _overlay(
        use_projection=False, grad_clip_norm=0.5, n_steps=30
    )
    np.testing.assert_allclose(j_curve[:5], t_curve[:5], atol=1e-3)
    band = np.abs(j_curve - t_curve)
    assert band.max() < 0.05, f"curves diverged: max |d|={band.max():.4f}"
    assert np.corrcoef(t_curve, j_curve)[0, 1] > 0.999
