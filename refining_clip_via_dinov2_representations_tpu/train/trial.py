"""Standalone smoke harness (`src/open_clip_train/trial.py`).

Dummy linear two-tower model + fake DINO teacher + random-tensor dataset,
driven through the REAL train-step machinery (dino loss, optimizer,
gradient accumulation). The reference's trial.py is the only place its
intended grad-accum algorithm survived (`trial.py:311-360` — the production
path lost it); here accumulation is the production `lax.scan` path, so this
harness smoke-tests exactly what trains.

Run: python -m refining_clip_via_dinov2_representations_tpu.train.trial
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class DummyModel(nn.Module):
    """Linear towers (`trial.py:71-88`): flattened image -> embed, mean token
    embedding -> embed, plus logit_scale."""

    embed_dim: int = 32
    vocab_size: int = 64

    @nn.compact
    def __call__(self, image, text, deterministic: bool = True):
        img = image.reshape(image.shape[0], -1)
        img_f = nn.Dense(self.embed_dim, name="image_proj")(img)
        tok = nn.Embed(self.vocab_size, self.embed_dim, name="token_embedding")(text)
        txt_f = nn.Dense(self.embed_dim, name="text_proj")(tok.mean(axis=1))
        logit_scale = self.param(
            "logit_scale", nn.initializers.constant(np.log(1 / 0.07)), ()
        )

        def norm(x):
            return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

        return {
            "image_features": norm(img_f),
            "text_features": norm(txt_f),
            "logit_scale": jnp.exp(logit_scale),
        }


def make_dummy_batch(rng: np.random.Generator, batch_size: int, accum: int = 1,
                     dino_dim: int = 16):
    """Random tensors (`trial.py:108-125`) shaped for the accum path."""
    def mk(b):
        return {
            "images": rng.normal(size=(b, 8, 8, 3)).astype(np.float32),
            "texts": rng.integers(1, 63, size=(b, 10)).astype(np.int32),
            "dino_features": rng.normal(size=(b, dino_dim)).astype(np.float32),
        }

    if accum == 1:
        return {k: jnp.asarray(v) for k, v in mk(batch_size).items()}
    micro = [mk(batch_size // accum) for _ in range(accum)]
    return {
        k: jnp.asarray(np.stack([m[k] for m in micro])) for k in micro[0]
    }


def main(steps: int = 20, batch_size: int = 16, accum: int = 2):
    from ..losses import DinoLossCfg
    from ..losses.dino import DinoProjectionHead
    from .optim import OptimCfg, build_optimizer
    from .scheduler import const_lr
    from .step import StepCfg, create_train_state, make_train_step

    model = DummyModel()
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((2, 8, 8, 3)), jnp.zeros((2, 10), jnp.int32))

    head = DinoProjectionHead(dino_dim=16, projection_type="mlp")
    head_params = head.init(rng, jnp.zeros((2, 32)))["params"]

    params = {"model": variables["params"], "dino_head": head_params}
    cfg = OptimCfg(lr=1e-2, wd=0.0, use_param_groups=False)
    tx, _ = build_optimizer(params, cfg, const_lr(1e-2, 0, steps))
    state = create_train_state(rng, variables["params"], tx, head_params)

    step_cfg = StepCfg(
        loss_type="dino",
        dino=DinoLossCfg(lambda_soft=0.5, soft_mode="kl_teacher"),
        accum_freq=accum,
    )
    train_step = make_train_step(model, tx, step_cfg, head=head)

    npr = np.random.default_rng(0)
    first = last = None
    for i in range(steps):
        batch = make_dummy_batch(npr, batch_size, accum=accum)
        state, metrics = train_step(state, batch)
        loss = float(metrics["total_loss"])
        if first is None:
            first = loss
        last = loss
        if i % 5 == 0:
            print(f"step {i}: total={loss:.4f} soft={float(metrics['soft_loss']):.4f}")

    assert np.isfinite(last), "training diverged"
    assert last < first, f"loss did not decrease: {first:.4f} -> {last:.4f}"
    print(f"OK: loss {first:.4f} -> {last:.4f} over {steps} steps (accum={accum})")
    return first, last


if __name__ == "__main__":
    import sys

    if "--tpu" not in sys.argv:  # tiny model: CPU is instant, tunnel compile isn't
        jax.config.update("jax_platforms", "cpu")
    main()
