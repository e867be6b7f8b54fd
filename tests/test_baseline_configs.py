"""Coverage for the BASELINE.json config families (CPU-mesh scale models).

1. SigLIP-style sigmoid loss training across a mesh (config 4's shape).
2. Deep/remat student (EVA-g-style gradient checkpointing; config 5).
3. Live DINOv2 teacher feeding the DINO-soft loss (configs 2-3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.losses import DinoLossCfg
from refining_clip_via_dinov2_representations_tpu.models import (
    build_model,
    parse_model_cfg,
)
from refining_clip_via_dinov2_representations_tpu.parallel.mesh import (
    create_mesh,
    shard_batch,
)
from refining_clip_via_dinov2_representations_tpu.train.optim import (
    OptimCfg,
    build_optimizer,
)
from refining_clip_via_dinov2_representations_tpu.train.scheduler import const_lr
from refining_clip_via_dinov2_representations_tpu.train.step import (
    StepCfg,
    create_train_state,
    make_train_step,
)

SIGLIP_TINY = {
    "embed_dim": 32,
    "init_logit_bias": -10,
    "vision_cfg": {"image_size": 16, "patch_size": 8, "width": 32, "layers": 2,
                   "head_width": 16},
    "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 4,
                 "layers": 2, "no_causal_mask": True, "pool_type": "last",
                 "proj_bias": True},
}


def _mk(cfg_dict, loss_type, remat=False, optim=None, **step_kw):
    model = build_model(parse_model_cfg(cfg_dict), remat=remat)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((2, cfg_dict["vision_cfg"]["image_size"],
                     cfg_dict["vision_cfg"]["image_size"], 3))
    txt = jnp.zeros((2, cfg_dict["text_cfg"]["context_length"]), jnp.int32)
    variables = model.init(rng, img, txt)
    params = {"model": variables["params"]}
    tx, _ = build_optimizer(params, optim or OptimCfg(lr=1e-3), const_lr(1e-3, 0, 10))
    state = create_train_state(rng, variables["params"], tx)
    step = make_train_step(model, tx, StepCfg(loss_type=loss_type, **step_kw))
    return model, state, step


def _batch(cfg_dict, b, seed=0, dino_dim=None):
    rng = np.random.default_rng(seed)
    s = cfg_dict["vision_cfg"]["image_size"]
    l = cfg_dict["text_cfg"]["context_length"]
    v = cfg_dict["text_cfg"]["vocab_size"]
    out = {
        "images": jnp.asarray(rng.normal(size=(b, s, s, 3)), jnp.float32),
        "texts": jnp.asarray(rng.integers(1, v - 1, size=(b, l)), jnp.int32),
    }
    if dino_dim:
        out["dino_features"] = jnp.asarray(rng.normal(size=(b, dino_dim)), jnp.float32)
    return out


def test_siglip_training_under_mesh():
    """Config 4: sigmoid loss with logit_bias, data-sharded batch."""
    model, state, step = _mk(SIGLIP_TINY, "siglip")
    assert "logit_bias" in state.params["model"]

    mesh = create_mesh()
    with jax.set_mesh(mesh):
        batch = shard_batch(_batch(SIGLIP_TINY, 16), mesh)
        prev = None
        for _ in range(5):
            state, metrics = step(state, batch)
            cur = float(metrics["total_loss"])
            assert np.isfinite(cur)
            prev = prev or cur
    assert cur < prev  # sigmoid loss trains


def test_deep_remat_student_trains():
    """Config 5 analogue: deeper tower with grad checkpointing (remat)."""
    cfg = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 16, "patch_size": 8, "width": 32, "layers": 6,
                       "head_width": 16},
        "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 4,
                     "layers": 4},
    }
    _, state, step = _mk(cfg, "dino", remat=True,
                         dino=DinoLossCfg(lambda_soft=0.5))
    batch = _batch(cfg, 8, dino_dim=24)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["soft_loss"]) > 0


def test_live_dino_teacher_feeds_train_step():
    """Configs 2-3: frozen DINOv2 computes per-batch teacher features."""
    torch = pytest.importorskip("torch")
    from transformers import Dinov2Config, Dinov2Model

    from refining_clip_via_dinov2_representations_tpu.models.dinov2 import (
        Dinov2,
        Dinov2Cfg,
        convert_dinov2_state_dict,
    )
    from refining_clip_via_dinov2_representations_tpu.train.dino_teacher import (
        LiveDinoTeacher,
    )

    torch.manual_seed(0)
    hf = Dinov2Model(Dinov2Config(hidden_size=32, num_hidden_layers=2,
                                  num_attention_heads=4, mlp_ratio=2,
                                  patch_size=14, image_size=28))
    teacher_model = Dinov2(cfg=Dinov2Cfg(hidden_size=32, layers=2, heads=4,
                                         mlp_ratio=2, native_image_size=28))
    teacher = LiveDinoTeacher(
        teacher_model, {"params": convert_dinov2_state_dict(hf.state_dict())}
    )

    cfg = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 28, "patch_size": 14, "width": 32, "layers": 2,
                       "head_width": 16},
        "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 4,
                     "layers": 2},
    }
    _, state, step = _mk(cfg, "dino", dino=DinoLossCfg(lambda_soft=0.7))
    batch = _batch(cfg, 8)
    batch["dino_features"] = teacher.extract(batch["images"])
    assert batch["dino_features"].shape == (8, 32)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["soft_loss"]) > 0


def test_siglip_32k_global_batch_loss_scale():
    """Config 4's communication shape: 32k global batch sigmoid loss over an
    8-way ring at the loss level (features only — the memory-light regime the
    ring exists for; per-device block 4096)."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from refining_clip_via_dinov2_representations_tpu.losses import siglip_loss

    rng = np.random.default_rng(0)
    b, d = 32768, 16
    img = rng.normal(size=(b, d)).astype(np.float32)
    txt = rng.normal(size=(b, d)).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    def sharded(i, t):
        l = siglip_loss(i, t, 20.0, -10.0, axis_name="data", axis_size=8,
                        dist_impl="bidir")
        return jax.lax.psum(l, "data")

    fn = jax.jit(shard_map(sharded, mesh=mesh,
                           in_specs=(P("data"), P("data")), out_specs=P()))
    with mesh:
        total = float(fn(jnp.asarray(img), jnp.asarray(txt)))
    assert np.isfinite(total)
    # ring covers every pair exactly once: loss ≈ B * softplus-ish magnitude
    per_row = total / b
    assert per_row > 0
