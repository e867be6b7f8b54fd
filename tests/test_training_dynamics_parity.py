"""Training-dynamics parity: 3 AdamW steps of our stack vs torch on identical
weights/batches — validates model backward + optimizer together (optax.adamw
and torch.optim.AdamW share decoupled-wd semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from refining_clip_via_dinov2_representations_tpu.losses import clip_loss
from refining_clip_via_dinov2_representations_tpu.models import (
    build_model,
    convert_clip_state_dict,
    parse_model_cfg,
)
from tests.ref_loader import load_ref, reference_available

torch = pytest.importorskip("torch")
if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)

TINY = dict(
    embed_dim=32,
    vision_cfg=dict(image_size=16, patch_size=8, width=32, layers=2, head_width=16),
    text_cfg=dict(context_length=12, vocab_size=64, width=32, heads=4, layers=2),
)


def test_three_step_adamw_parity():
    ref_model_mod = load_ref("model")
    ref_loss_mod = load_ref("loss")
    torch.manual_seed(1)
    ref = ref_model_mod.CLIP(
        embed_dim=32,
        vision_cfg=ref_model_mod.CLIPVisionCfg(**TINY["vision_cfg"]),
        text_cfg=ref_model_mod.CLIPTextCfg(**TINY["text_cfg"]),
    )
    ref.train()

    model = build_model(parse_model_cfg(TINY))
    params = jax.tree.map(jnp.asarray, convert_clip_state_dict(ref.state_dict()))

    lr, wd, b1, b2, eps = 1e-3, 0.1, 0.9, 0.98, 1e-6
    t_opt = torch.optim.AdamW(ref.parameters(), lr=lr, betas=(b1, b2), eps=eps,
                              weight_decay=wd)
    tx = optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    opt_state = tx.init(params)
    t_loss_fn = ref_loss_mod.ClipLoss()

    rng = np.random.default_rng(0)
    for step in range(3):
        images = rng.normal(size=(6, 3, 16, 16)).astype(np.float32)
        texts = rng.integers(1, 63, size=(6, 12)).astype(np.int64)

        # torch step
        t_opt.zero_grad()
        img_f, txt_f, scale = ref(torch.from_numpy(images), torch.from_numpy(texts))
        t_loss = t_loss_fn(img_f, txt_f, scale)
        t_loss.backward()
        t_opt.step()

        # our step
        def loss_fn(p):
            o = model.apply({"params": p}, jnp.asarray(images),
                            jnp.asarray(texts.astype(np.int32)))
            return clip_loss(o["image_features"], o["text_features"], o["logit_scale"])

        j_loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        assert abs(float(j_loss) - float(t_loss)) < 5e-5, step

    # parameter drift comparison after 3 steps
    ours_sd_params = convert_clip_state_dict(ref.state_dict())
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()),
        params, ours_sd_params,
    )
    worst = max(jax.tree.leaves(diffs))
    # early Adam steps divide ~equal fp32 grad noise (~2e-5) by sqrt(v)+eps
    # with tiny v, amplifying it; observed drift ~8e-5 after 3 steps.
    assert worst < 3e-4, f"parameter drift after 3 steps: {worst}"


def test_bf16_embedding_drift_bounded():
    """bf16 compute keeps converted-embedding cosine > 0.995 vs fp32."""
    model32 = build_model(parse_model_cfg(TINY))
    model16 = build_model(parse_model_cfg(TINY), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(4, 16, 16, 3)), jnp.float32)
    texts = jnp.asarray(rng.integers(1, 63, size=(4, 12)), jnp.int32)
    variables = model32.init(jax.random.PRNGKey(0), images, texts)

    o32 = model32.apply(variables, images, texts)
    o16 = model16.apply(variables, images, texts)
    for key in ("image_features", "text_features"):
        a = np.asarray(o32[key], np.float32)
        b = np.asarray(o16[key], np.float32)
        cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
        assert cos.min() > 0.995, (key, cos.min())


def test_fifty_step_dino_loss_curve_parity():
    """50-step loss-curve overlay vs the torch reference (VERDICT weak #8):
    same weights, same batches, DINO-soft objective, AdamW — per-step losses
    must track within a tolerance band the whole way down."""
    ref_model_mod = load_ref("model")
    ref_loss_mod = load_ref("loss")
    torch.manual_seed(7)
    ref = ref_model_mod.CLIP(
        embed_dim=32,
        vision_cfg=ref_model_mod.CLIPVisionCfg(**TINY["vision_cfg"]),
        text_cfg=ref_model_mod.CLIPTextCfg(**TINY["text_cfg"]),
    )
    ref.train()

    from refining_clip_via_dinov2_representations_tpu.losses import (
        DinoLossCfg,
        dino_enhanced_loss,
    )

    model = build_model(parse_model_cfg(TINY))
    params = jax.tree.map(jnp.asarray, convert_clip_state_dict(ref.state_dict()))

    lr, wd, b1, b2, eps = 1e-3, 0.1, 0.9, 0.98, 1e-6
    t_opt = torch.optim.AdamW(ref.parameters(), lr=lr, betas=(b1, b2), eps=eps,
                              weight_decay=wd)
    tx = optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    opt_state = tx.init(params)

    from types import SimpleNamespace

    t_loss_fn = ref_loss_mod.ClipLossWithDINOEnhancements()
    t_args = SimpleNamespace(
        use_projection=False, lambda_original=1.0, lambda_soft=0.5,
        soft_mode="kl_teacher", teacher_temp=0.15, soft_dino_to_text=False,
        text_lambda=0.0, text_student_temp=0.05, lambda_weighted=0.0,
        rho=0.1, c_clip=1.0, weight_text_symmetry=False,
    )
    cfg = DinoLossCfg(lambda_original=1.0, lambda_soft=0.5,
                      soft_mode="kl_teacher", teacher_temp=0.15,
                      use_projection=False)

    @jax.jit
    def step(params, opt_state, images, texts, dino):
        def loss_fn(p):
            o = model.apply({"params": p}, images, texts)
            out = dino_enhanced_loss(
                o["image_features"], o["text_features"], o["logit_scale"],
                dino, cfg,
            )
            return out["total_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    rng = np.random.default_rng(42)
    t_curve, j_curve = [], []
    for _ in range(50):
        images = rng.normal(size=(8, 3, 16, 16)).astype(np.float32)
        texts = rng.integers(1, 63, size=(8, 12)).astype(np.int64)
        dino = rng.normal(size=(8, 24)).astype(np.float32)

        t_opt.zero_grad()
        img_f, txt_f, scale = ref(torch.from_numpy(images), torch.from_numpy(texts))
        # quirk: the reference returns None unless output_dict=True
        t_loss = t_loss_fn(img_f, txt_f, scale, torch.from_numpy(dino),
                           args=t_args, output_dict=True)["total_loss"]
        t_loss.backward()
        t_opt.step()
        t_curve.append(float(t_loss))

        j_loss, params, opt_state = step(
            params, opt_state,
            jnp.asarray(images.transpose(0, 2, 3, 1)),
            jnp.asarray(texts.astype(np.int32)),
            jnp.asarray(dino),
        )
        j_curve.append(float(j_loss))

    t_curve = np.asarray(t_curve)
    j_curve = np.asarray(j_curve)
    # banded overlay: early steps bit-close, later steps within a drift band
    np.testing.assert_allclose(j_curve[:5], t_curve[:5], atol=5e-4)
    band = np.abs(j_curve - t_curve)
    assert band.max() < 0.05, f"curves diverged: max |d|={band.max():.4f}"
    assert np.corrcoef(t_curve, j_curve)[0, 1] > 0.999
    # both implementations actually trained
    assert t_curve[-5:].mean() < t_curve[:5].mean()
    assert j_curve[-5:].mean() < j_curve[:5].mean()


MID = dict(
    embed_dim=64,
    vision_cfg=dict(image_size=32, patch_size=16, width=256, layers=6, head_width=64),
    text_cfg=dict(context_length=16, vocab_size=128, width=256, heads=4, layers=6),
)


def test_fifty_step_midsize_dino_parity_with_head_and_warmup():
    """Mid-size 50-step overlay (VERDICT r2 Next #6): width 256 / 6 layers /
    batch 32 with the projection head enabled, weight_text_symmetry on, AND
    the λ_soft linear warm-up active — covers the λ/head/weighted
    interactions the toy overlay skips. The head follows the reference quirk:
    it receives gradients but is NEVER optimizer-updated (`loss.py:214-238`
    lazily created after the optimizer is built, SURVEY §2.2) — both sides
    keep it frozen at its initial weights."""
    ref_model_mod = load_ref("model")
    ref_loss_mod = load_ref("loss")
    torch.manual_seed(11)
    ref = ref_model_mod.CLIP(
        embed_dim=64,
        vision_cfg=ref_model_mod.CLIPVisionCfg(**MID["vision_cfg"]),
        text_cfg=ref_model_mod.CLIPTextCfg(**MID["text_cfg"]),
    )
    ref.train()

    from types import SimpleNamespace

    from refining_clip_via_dinov2_representations_tpu.losses import (
        DinoLossCfg,
        dino_enhanced_loss,
    )
    from refining_clip_via_dinov2_representations_tpu.losses.dino import (
        DinoProjectionHead,
    )
    from tests.test_losses import _torch_head_to_flax

    model = build_model(parse_model_cfg(MID))
    params = jax.tree.map(jnp.asarray, convert_clip_state_dict(ref.state_dict()))

    lr, wd, b1, b2, eps = 1e-3, 0.1, 0.9, 0.98, 1e-6
    t_opt = torch.optim.AdamW(ref.parameters(), lr=lr, betas=(b1, b2), eps=eps,
                              weight_decay=wd)
    tx = optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    opt_state = tx.init(params)

    warmup, lam_soft, dino_dim, batch = 20, 0.5, 48, 32
    t_loss_fn = ref_loss_mod.ClipLossWithDINOEnhancements()

    def t_args_at(step):
        # make_effective_args warm-up (`train.py:105-127`): λ_soft only
        frac = min(1.0, step / warmup) if warmup > 0 else 1.0
        return SimpleNamespace(
            use_projection=True, projection_type="mlp", use_layernorm=False,
            residual_projection=False, residual_alpha=None,
            lambda_original=1.0, lambda_soft=frac * lam_soft,
            soft_mode="kl_teacher", teacher_temp=0.15, soft_dino_to_text=False,
            text_lambda=0.0, text_student_temp=0.05, lambda_weighted=0.3,
            rho=0.1, c_clip=1.0, weight_text_symmetry=True,
        )

    cfg = DinoLossCfg(
        lambda_original=1.0, lambda_soft=lam_soft, soft_mode="kl_teacher",
        teacher_temp=0.15, lambda_weighted=0.3, rho=0.1, c_clip=1.0,
        weight_text_symmetry=True, use_projection=True, projection_type="mlp",
    )

    rng = np.random.default_rng(123)
    batches = [
        (
            rng.normal(size=(batch, 3, 32, 32)).astype(np.float32),
            rng.integers(1, 127, size=(batch, 16)).astype(np.int64),
            rng.normal(size=(batch, dino_dim)).astype(np.float32),
        )
        for _ in range(50)
    ]

    # trigger the reference's lazy head creation, then mirror its weights
    with torch.no_grad():
        img_f0, txt_f0, scale0 = ref(
            torch.from_numpy(batches[0][0]), torch.from_numpy(batches[0][1])
        )
        t_loss_fn(img_f0, txt_f0, scale0, torch.from_numpy(batches[0][2]),
                  args=t_args_at(0), output_dict=True)
    head = DinoProjectionHead(dino_dim=dino_dim, projection_type="mlp")
    head_params = jax.tree.map(
        jnp.asarray, _torch_head_to_flax(t_loss_fn, "mlp", False)
    )

    @jax.jit
    def step(params, opt_state, images, texts, dino, lam_soft_eff):
        def loss_fn(p):
            o = model.apply({"params": p}, images, texts)
            raw_proj = head.apply({"params": head_params}, o["image_features"])
            out = dino_enhanced_loss(
                o["image_features"], o["text_features"], o["logit_scale"],
                dino, cfg, image_proj=raw_proj,
                lambda_overrides={"lambda_soft": lam_soft_eff},
            )
            return out["total_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    t_curve, j_curve = [], []
    for i, (images, texts, dino) in enumerate(batches):
        t_opt.zero_grad()
        img_f, txt_f, scale = ref(torch.from_numpy(images), torch.from_numpy(texts))
        t_loss = t_loss_fn(img_f, txt_f, scale, torch.from_numpy(dino),
                           args=t_args_at(i), output_dict=True)["total_loss"]
        t_loss.backward()
        t_opt.step()
        t_curve.append(float(t_loss))

        lam_eff = min(1.0, i / warmup) * lam_soft
        j_loss, params, opt_state = step(
            params, opt_state,
            jnp.asarray(images.transpose(0, 2, 3, 1)),
            jnp.asarray(texts.astype(np.int32)),
            jnp.asarray(dino),
            jnp.asarray(lam_eff, jnp.float32),
        )
        j_curve.append(float(j_loss))

    t_curve = np.asarray(t_curve)
    j_curve = np.asarray(j_curve)
    np.testing.assert_allclose(j_curve[:5], t_curve[:5], atol=1e-3)
    band = np.abs(j_curve - t_curve)
    assert band.max() < 0.05, f"curves diverged: max |d|={band.max():.4f}"
    assert np.corrcoef(t_curve, j_curve)[0, 1] > 0.999
    assert t_curve[-5:].mean() < t_curve[:5].mean()
    assert j_curve[-5:].mean() < j_curve[:5].mean()
