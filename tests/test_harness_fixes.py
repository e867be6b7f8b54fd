"""Regression tests for the r3 training-harness review findings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_imagefolder_numeric_dirs_map_to_class_index(tmp_path):
    """ImageNet-V2 layout (dirs '0'..'999'): folder N must be label N, not
    its lexicographic rank ('10' would sort to rank 2)."""
    from PIL import Image

    from refining_clip_via_dinov2_representations_tpu.train.data import (
        ImageFolderDataset,
    )

    rng = np.random.default_rng(0)
    for d in ("0", "1", "10", "2"):
        (tmp_path / d).mkdir()
        Image.fromarray(
            rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        ).save(tmp_path / d / "x.jpg")
    ds = ImageFolderDataset(str(tmp_path))
    assert ds.class_to_idx == {"0": 0, "1": 1, "2": 2, "10": 10}
    labels = sorted(int(s[1]) for s in ds.samples)
    assert labels == [0, 1, 2, 10]

    # non-numeric dirs keep the torchvision lexicographic convention
    named = tmp_path / "named"
    for d in ("dog", "cat"):
        (named / d).mkdir(parents=True)
        Image.fromarray(
            rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        ).save(named / d / "x.jpg")
    ds2 = ImageFolderDataset(str(named))
    assert ds2.class_to_idx == {"cat": 0, "dog": 1}


def _tiny_params():
    def blk():
        return {"attn": {"in_proj_kernel": np.zeros((8, 24), np.float32)},
                "mlp": {"c_fc": {"kernel": np.zeros((8, 32), np.float32)}}}

    return {
        "model": {
            "visual": {
                "transformer": {"resblocks_0": blk(), "resblocks_1": blk(),
                                "cross_attn_0": blk(), "cross_attn_1": blk()},
                "ln_post": {"scale": np.ones(8, np.float32)},
                "proj": np.zeros((8, 4), np.float32),
            },
            "text": {"transformer": {"resblocks_0": blk(), "resblocks_1": blk()}},
            "logit_scale": np.zeros((), np.float32),
        }
    }


def test_vision_layer_count_ignores_cross_attn_siblings():
    """CoCa-style cross_attn_* siblings under visual/transformer must not
    inflate the lock-unlock threshold."""
    from refining_clip_via_dinov2_representations_tpu.train.optim import (
        OptimCfg,
        label_params,
    )

    params = _tiny_params()
    cfg = OptimCfg(lr=1e-3, lock_image=True, lock_image_unlocked_groups=1)
    labels = label_params(params, cfg)
    vt = labels["model"]["visual"]["transformer"]
    # 2 resblocks; unlock the LAST one (index >= 2-1) — counting the
    # cross_attn siblings would give vision_layers=4 and freeze everything
    frozen0 = set(jax.tree.leaves(vt["resblocks_0"]))
    open1 = set(jax.tree.leaves(vt["resblocks_1"]))
    assert frozen0 == {"frozen"}
    assert "frozen" not in open1


def test_no_param_groups_keeps_tower_lock():
    """--no-param-groups must still honor --lock-image (the reference locks
    via requires_grad independent of optimizer grouping)."""
    import optax

    from refining_clip_via_dinov2_representations_tpu.train.optim import (
        OptimCfg,
        build_optimizer,
    )
    from refining_clip_via_dinov2_representations_tpu.train.scheduler import const_lr

    params = jax.tree.map(jnp.asarray, _tiny_params())
    cfg = OptimCfg(lr=1e-3, lock_image=True, lock_image_unlocked_groups=0,
                   use_param_groups=False)
    tx, labels = build_optimizer(params, cfg, const_lr(1e-3, 0, 10))
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    vis = updates["model"]["visual"]
    assert all(
        float(jnp.abs(u).max()) == 0.0 for u in jax.tree.leaves(vis)
    ), "locked tower received updates under --no-param-groups"
    txt = updates["model"]["text"]
    assert any(float(jnp.abs(u).max()) > 0.0 for u in jax.tree.leaves(txt))


def test_evaluate_empty_val_loader_returns_gracefully():
    from types import SimpleNamespace

    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model,
        parse_model_cfg,
    )
    from refining_clip_via_dinov2_representations_tpu.train.evaluate import evaluate

    cfg = {
        "embed_dim": 16,
        "vision_cfg": {"image_size": 16, "patch_size": 8, "width": 16,
                       "layers": 1, "head_width": 16},
        "text_cfg": {"context_length": 8, "vocab_size": 32, "width": 16,
                     "heads": 2, "layers": 1},
    }
    model = build_model(parse_model_cfg(cfg))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1, 8), jnp.int32),
    )

    class EmptyLoader:
        num_samples = 0

        def __iter__(self):
            return iter(())

    data = {"val": SimpleNamespace(dataloader=EmptyLoader())}
    args = SimpleNamespace(val_frequency=1, epochs=1, zeroshot_frequency=0)
    m = evaluate(model, variables, data, 1, args, tokenizer=None)
    assert "text_to_image_R@1" not in m  # no crash, no bogus metrics
