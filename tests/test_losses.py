"""Loss parity vs the PyTorch reference + multi-device collective tests."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.losses import (
    DinoLossCfg,
    DinoProjectionHead,
    apply_projection,
    clip_loss,
    coca_loss,
    compute_student_tau,
    cyclip_loss,
    dino_enhanced_loss,
    distill_clip_loss,
    siglip_loss,
)
from tests.ref_loader import load_ref, reference_available

torch = pytest.importorskip("torch")

if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)


def _feats(b=8, d=16, seed=0, normed=True):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(b, d)).astype(np.float32)
    txt = rng.normal(size=(b, d)).astype(np.float32)
    dino = rng.normal(size=(b, 12)).astype(np.float32)
    if normed:
        img /= np.linalg.norm(img, axis=-1, keepdims=True)
        txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    return img, txt, dino


# ---------------------------------------------------------------------------
# single-process parity vs reference
# ---------------------------------------------------------------------------

def test_clip_loss_parity():
    ref_loss = load_ref("loss").ClipLoss()
    img, txt, _ = _feats()
    scale = 50.0
    ref = ref_loss(torch.tensor(img), torch.tensor(txt), torch.tensor(scale)).item()
    ours = float(clip_loss(jnp.asarray(img), jnp.asarray(txt), scale))
    assert abs(ref - ours) < 1e-5


def test_siglip_loss_parity():
    ref_loss = load_ref("loss").SigLipLoss()
    img, txt, _ = _feats()
    ref = ref_loss(
        torch.tensor(img), torch.tensor(txt), torch.tensor(30.0), torch.tensor(-10.0)
    ).item()
    ours = float(siglip_loss(jnp.asarray(img), jnp.asarray(txt), 30.0, -10.0))
    assert abs(ref - ours) < 1e-4


def test_cyclip_loss_parity():
    ref_loss = load_ref("loss").CyCLIPLoss()
    img, txt, _ = _feats()
    ref = ref_loss(torch.tensor(img), torch.tensor(txt), torch.tensor(40.0), output_dict=True)
    ours = cyclip_loss(jnp.asarray(img), jnp.asarray(txt), 40.0)
    for k in ("clip_loss", "inmodal_cyclic", "crossmodal_cyclic", "total_loss"):
        assert abs(float(ours[k]) - ref[k if k != "total_loss" else "total_loss"].item()) < 1e-5, k


def test_distill_loss_parity():
    ref_loss = load_ref("loss").DistillClipLoss()
    img, txt, _ = _feats()
    img2, txt2, _ = _feats(seed=1)
    c_ref, d_ref = ref_loss(
        torch.tensor(img), torch.tensor(txt), torch.tensor(40.0),
        torch.tensor(img2), torch.tensor(txt2), torch.tensor(35.0),
    )
    ours = distill_clip_loss(
        jnp.asarray(img), jnp.asarray(txt), 40.0,
        jnp.asarray(img2), jnp.asarray(txt2), 35.0,
    )
    assert abs(float(ours["contrastive_loss"]) - c_ref.item()) < 1e-5
    assert abs(float(ours["distill_loss"]) - d_ref.item()) < 1e-5


def test_coca_loss_parity():
    ref_loss = load_ref("loss").CoCaLoss(caption_loss_weight=2.0, clip_loss_weight=1.0)
    img, txt, _ = _feats()
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(8, 10, 32)).astype(np.float32)
    labels = rng.integers(0, 32, size=(8, 10))
    labels[:, -2:] = 0  # pad
    c_ref, cap_ref = ref_loss(
        torch.tensor(img), torch.tensor(txt),
        torch.tensor(logits), torch.tensor(labels), torch.tensor(40.0),
    )
    ours = coca_loss(
        jnp.asarray(img), jnp.asarray(txt),
        jnp.asarray(logits), jnp.asarray(labels.astype(np.int32)), 40.0,
        caption_loss_weight=2.0, clip_loss_weight=1.0,
    )
    assert abs(float(ours["contrastive_loss"]) - c_ref.item()) < 1e-5
    assert abs(float(ours["caption_loss"]) - cap_ref.item()) < 1e-5


def test_student_tau_parity():
    ref_mod = load_ref("loss")
    for v in [2.659, 4.6, 14.0, 100.0, 250.0]:
        ref = ref_mod.compute_student_tau(torch.tensor(v)).item()
        ours = float(compute_student_tau(jnp.asarray(v)))
        assert abs(ref - ours) < 1e-6, v


def _torch_head_to_flax(ref_loss, projection_type, use_layernorm):
    head = ref_loss.image_to_dino_proj
    if projection_type == "linear":
        return {"proj": {"kernel": head.weight.detach().numpy().T,
                         "bias": head.bias.detach().numpy()}}
    params = {
        "fc1": {"kernel": head[0].weight.detach().numpy().T,
                "bias": head[0].bias.detach().numpy()},
        "fc2": {"kernel": head[2].weight.detach().numpy().T,
                "bias": head[2].bias.detach().numpy()},
    }
    if use_layernorm:
        params["ln"] = {"scale": head[3].weight.detach().numpy(),
                        "bias": head[3].bias.detach().numpy()}
    return params


@pytest.mark.parametrize("projection_type,use_layernorm,residual",
                         [("mlp", False, False), ("linear", False, False),
                          ("mlp", True, False), ("mlp", False, True)])
def test_dino_enhanced_loss_parity(projection_type, use_layernorm, residual):
    ref_mod = load_ref("loss")
    ref_loss = ref_mod.ClipLossWithDINOEnhancements()
    img, txt, dino = _feats(b=8, d=16)

    args = SimpleNamespace(
        use_projection=True,
        projection_type=projection_type,
        use_layernorm=use_layernorm,
        residual_projection=residual,
        residual_alpha=0.3 if residual else None,
        lambda_soft=0.7,
        soft_mode="kl_teacher",
        teacher_temp=0.15,
        soft_dino_to_text=True,
        text_lambda=0.2,
        text_student_temp=0.05,
        lambda_weighted=0.5,
        rho=0.1,
        c_clip=1.0,
        weight_text_symmetry=True,
        lambda_original=1.0,
    )
    torch.manual_seed(0)
    logit_scale = torch.tensor(3.2)
    ref_out = ref_loss(
        torch.tensor(img), torch.tensor(txt), logit_scale,
        dino_features=torch.tensor(dino), args=args, output_dict=True,
    )

    cfg = DinoLossCfg(
        lambda_original=1.0, lambda_soft=0.7, soft_mode="kl_teacher",
        teacher_temp=0.15, soft_dino_to_text=True, text_lambda=0.2,
        text_student_temp=0.05, lambda_weighted=0.5, rho=0.1, c_clip=1.0,
        weight_text_symmetry=True, use_projection=True,
        projection_type=projection_type, use_layernorm=use_layernorm,
        residual_projection=residual, residual_alpha=0.3 if residual else None,
        with_diagnostics=True,
    )
    head = DinoProjectionHead(
        dino_dim=dino.shape[-1], projection_type=projection_type,
        use_layernorm=use_layernorm,
    )
    head_params = _torch_head_to_flax(ref_loss, projection_type, use_layernorm)
    raw_proj = head.apply({"params": head_params}, jnp.asarray(img))

    ours = dino_enhanced_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(3.2),
        jnp.asarray(dino), cfg, image_proj=raw_proj,
    )
    for k_ours, k_ref in [("total_loss", "total_loss"), ("classic_loss", "classic_loss"),
                          ("soft_loss", "soft_loss"), ("weighted_loss", "weighted_loss")]:
        assert abs(float(ours[k_ours]) - ref_out[k_ref].item()) < 2e-4, (
            k_ours, float(ours[k_ours]), ref_out[k_ref].item())
    # diagnostics present and sane
    assert float(ours["dbg/ce_img_base"]) > 0
    assert float(ours["dbg/corr_rhat_dprob_img"]) > 0  # modulation pushes the right way


def test_dino_loss_no_teacher_is_pure_clip():
    img, txt, _ = _feats()
    cfg = DinoLossCfg(lambda_soft=0.7, lambda_weighted=0.5)
    out = dino_enhanced_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(3.2), None, cfg)
    base = clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.exp(jnp.asarray(3.2)))
    # classic term uses raw logit_scale as passed; reference passes raw ln-scale
    ours_base = clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(3.2))
    assert abs(float(out["total_loss"]) - float(ours_base)) < 1e-6
    assert float(out["soft_loss"]) == 0.0


# ---------------------------------------------------------------------------
# multi-device: collectives on the 8-device CPU mesh
# ---------------------------------------------------------------------------

def _shard_map_loss(fn, n_dev=8):
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    return mesh, shard_map(fn, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())


def test_clip_loss_local_matches_global_single_device():
    img, txt, _ = _feats(b=16)
    single = float(clip_loss(jnp.asarray(img), jnp.asarray(txt), 50.0))

    def sharded(i, t):
        l = clip_loss(i, t, 50.0, axis_name="data", local_loss=True)
        return jax.lax.pmean(l, "data")

    mesh, fn = _shard_map_loss(sharded)
    with mesh:
        dist = float(fn(jnp.asarray(img), jnp.asarray(txt)))
    assert abs(single - dist) < 1e-5


def test_clip_loss_global_mode_matches():
    img, txt, _ = _feats(b=16)
    single = float(clip_loss(jnp.asarray(img), jnp.asarray(txt), 50.0))

    def sharded(i, t):
        l = clip_loss(i, t, 50.0, axis_name="data", local_loss=False)
        return jax.lax.pmean(l, "data")

    mesh, fn = _shard_map_loss(sharded)
    with mesh:
        dist = float(fn(jnp.asarray(img), jnp.asarray(txt)))
    assert abs(single - dist) < 1e-5


@pytest.mark.parametrize("dist_impl", ["shift", "bidir", "gather"])
def test_siglip_ring_matches_single_device(dist_impl):
    img, txt, _ = _feats(b=16)
    single = float(siglip_loss(jnp.asarray(img), jnp.asarray(txt), 30.0, -10.0))

    def sharded(i, t):
        # per-device loss covers local positives + all ring negatives;
        # global loss = sum over devices (reference sums per-rank losses via
        # DDP mean-of-sums… here: psum then renormalize by device count to
        # match the single-device `sum / B_local` normalization).
        l = siglip_loss(
            i, t, 30.0, -10.0, axis_name="data", axis_size=8, dist_impl=dist_impl
        )
        return jax.lax.psum(l, "data")

    mesh, fn = _shard_map_loss(sharded)
    with mesh:
        dist = float(fn(jnp.asarray(img), jnp.asarray(txt)))
    # single-device: -sum(16x16)/16. sharded: each device -sum(2x16)/2, psum
    # over 8 devices = -sum(16x16)/2 = 8x the single-device value.
    assert abs(single - dist / 8.0) < 1e-4


def test_dino_loss_under_shard_map():
    """DINO terms act on local blocks; classic term gathers globally."""
    img, txt, dino = _feats(b=16)
    cfg = DinoLossCfg(lambda_soft=0.5, lambda_weighted=0.3, weight_text_symmetry=True)

    def sharded(i, t, d):
        out = dino_enhanced_loss(i, t, jnp.asarray(3.2), d, cfg, axis_name="data")
        return jax.lax.pmean(out["total_loss"], "data")

    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    fn = shard_map(
        sharded, mesh=mesh, in_specs=(P("data"), P("data"), P("data")), out_specs=P()
    )
    with mesh:
        val = float(fn(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(dino)))
    assert np.isfinite(val) and val > 0
