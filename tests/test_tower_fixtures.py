"""Committed numeric fixtures for the oracle-less tower families
(VERDICT r3 #5).

EVA01/EVA02, ViTamin, FastViT/MCi have no in-environment checkpoint oracle
(zero egress; timm/torchvision absent — `scripts/verify_against_timm.py` is
the one-command closure for the first egress-enabled machine). Until then,
these fixtures pin each family's CURRENT numerics: fixed-seed init + fixed
input → committed output values, so a refactor cannot silently change the
math. SigLIP (HF-oracle-verified in test_siglip_tower.py) is pinned too as
cheap refactor insurance.

Values were generated on the CPU test platform (fp32, deterministic);
tolerances absorb XLA-version fusion-order noise while catching real drift
(reference capability matched: `/root/reference/src/open_clip/timm_model.py:23-198`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# fixed-seed fixture registry: first 6 values of row 0, plus global mean/std
FIXTURES = {
    "eva01_preln_vit": dict(
        head6=[1.6514138, 1.97004938, -0.30881441, 1.24645245, 0.42005545,
               -0.69106519],
        mean=0.3050146913, std=0.9809123384,
    ),
    "eva02": dict(
        head6=[1.59978449, -1.73040187, 0.1821375, 0.48021835, -0.01711375,
               -2.21007013],
        mean=-0.0935247284, std=1.2061950680,
    ),
    "vitamin": dict(
        head6=[-0.72959656, 1.13005054, 0.92901713, 0.80080974, -1.36109388,
               -0.29699963],
        mean=0.1075791114, std=0.9057591771,
    ),
    "fastvit": dict(
        head6=[-0.00296911, 0.00424031, 0.00544238, 0.0006188, -0.00519057,
               0.00365091],
        mean=-0.0001610223, std=0.0044992981,
    ),
    "mci_vit": dict(
        head6=[0.13377377, 2.16645074, -1.74581456, 0.77009004, -0.50190187,
               1.39880347],
        mean=-0.0221559969, std=1.3022805106,
    ),
    "siglip": dict(
        head6=[0.73302591, 0.88300574, -0.10633398, 1.74245203, -1.16940129,
               1.67046618],
        mean=-0.1122351812, std=1.0115737762,
    ),
}


def _build(name, rngs):
    """Deterministic tiny tower + input per family. The SAME rng stream order
    as the generation script: each family consumes exactly one normal draw."""
    if name == "eva01_preln_vit":
        from refining_clip_via_dinov2_representations_tpu.models.transformer import (
            VisionTransformer,
        )

        tower = VisionTransformer(
            image_size=(28, 28), patch_size=(14, 14), width=32, layers=2,
            heads=4, mlp_ratio=2.0, output_dim=16, no_ln_pre=True,
            proj_bias=True, patch_embed_bias=True, norm_eps=1e-6,
        )
        x = rngs.normal(size=(2, 28, 28, 3))
    elif name == "eva02":
        from refining_clip_via_dinov2_representations_tpu.models.eva02 import (
            Eva02Cfg,
            Eva02VisionTower,
        )

        tower = Eva02VisionTower(
            cfg=Eva02Cfg(width=32, layers=2, heads=4, mlp_hidden=24,
                         patch_size=8, image_size=16, ref_feat_shape=(4, 4)),
            output_dim=16,
        )
        x = rngs.normal(size=(2, 16, 16, 3))
    elif name == "vitamin":
        from refining_clip_via_dinov2_representations_tpu.models.vitamin import (
            ViTaminCfg,
            ViTaminVisionTower,
        )

        tower = ViTaminVisionTower(
            cfg=ViTaminCfg(stem_width=8, conv_dims=(8, 16), conv_depths=(1, 2),
                           embed_dim=32, depth=2, heads=4, image_size=32),
            output_dim=20,
        )
        x = rngs.normal(size=(2, 32, 32, 3))
    elif name == "fastvit":
        from refining_clip_via_dinov2_representations_tpu.models.fastvit import (
            FastVitCfg,
            FastVitTower,
        )

        tower = FastVitTower(
            cfg=FastVitCfg(layers=(1, 1, 1, 1), embed_dims=(8, 16, 32, 64),
                           image_size=64),
            output_dim=20,
        )
        x = rngs.normal(size=(2, 64, 64, 3))
    elif name == "mci_vit":
        from refining_clip_via_dinov2_representations_tpu.models.fastvit import (
            MciVisionTransformer,
        )

        tower = MciVisionTransformer(
            width=32, layers=2, heads=4, output_dim=16, image_size=32
        )
        x = rngs.normal(size=(2, 32, 32, 3))
    elif name == "siglip":
        from refining_clip_via_dinov2_representations_tpu.models.siglip import (
            SiglipVisionCfg,
            SiglipVisionTower,
        )

        tower = SiglipVisionTower(
            cfg=SiglipVisionCfg(width=32, layers=2, heads=4, mlp_dim=64,
                                patch_size=16, image_size=32)
        )
        x = rngs.normal(size=(2, 32, 32, 3))
    else:  # pragma: no cover
        raise KeyError(name)
    return tower, jnp.asarray(x, jnp.float32)


@pytest.mark.parametrize("name", list(FIXTURES))
def test_tower_numeric_fixture(name):
    # ONE shared rng stream in registry order (matches the generator script)
    rngs = np.random.default_rng(0)
    for consumed in FIXTURES:
        tower, x = _build(consumed, rngs)
        if consumed == name:
            break
    v = tower.init(jax.random.PRNGKey(0), x)
    out = np.asarray(tower.apply(v, x), np.float64)

    fx = FIXTURES[name]
    np.testing.assert_allclose(
        out[0, :6], fx["head6"], rtol=2e-4, atol=2e-5,
        err_msg=f"{name}: committed fixture drifted — if the change is an "
        "INTENDED numerics fix, regenerate the fixture and say why in the "
        "commit; silent drift here invalidates converter parity",
    )
    assert out.mean() == pytest.approx(fx["mean"], rel=2e-4, abs=2e-5), name
    assert out.std() == pytest.approx(fx["std"], rel=2e-4, abs=2e-5), name
