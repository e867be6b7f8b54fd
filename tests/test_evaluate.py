"""evaluate() gating + encode-fn compile caching (reference train.py:588-760)."""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.models import (
    build_model,
    parse_model_cfg,
)
from refining_clip_via_dinov2_representations_tpu.train.evaluate import (
    _encode_fn,
    evaluate,
)

TINY_CFG = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 16, "patch_size": 8, "width": 32, "layers": 2, "head_width": 16},
    "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 4, "layers": 2},
}


def _model_and_vars():
    model = build_model(parse_model_cfg(TINY_CFG))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 12), jnp.int32)
    )
    return model, variables


class _ExplodingLoader:
    """A loader that fails the test if evaluate() iterates it."""

    num_samples = 8

    def __iter__(self):
        raise AssertionError("evaluate() should have been gated off")


def _args(val_frequency, epochs=6):
    return types.SimpleNamespace(
        val_frequency=val_frequency, epochs=epochs, imagenet_val=None,
        imagenet_v2=None, zeroshot_frequency=0,
    )


def _data_exploding():
    return {"val": types.SimpleNamespace(dataloader=_ExplodingLoader())}


def test_val_frequency_zero_skips_entirely():
    model, variables = _model_and_vars()
    m = evaluate(model, variables, _data_exploding(), epoch=2, args=_args(0))
    assert "clip_val_loss" not in m


def test_val_frequency_modulo_gate():
    model, variables = _model_and_vars()
    # epoch 1 with frequency 2: skipped (not final epoch either)
    m = evaluate(model, variables, _data_exploding(), epoch=1, args=_args(2))
    assert "clip_val_loss" not in m
    # final epoch always runs regardless of modulo
    with pytest.raises(AssertionError, match="gated off"):
        evaluate(model, variables, _data_exploding(), epoch=5, args=_args(2, epochs=5))


def test_encode_fn_cached_across_calls():
    model, variables = _model_and_vars()
    f1 = _encode_fn(model)
    f2 = _encode_fn(model)
    assert f1 is f2, "encode fn must be cached per model (no per-eval recompile)"
    img, txt = jnp.zeros((2, 16, 16, 3)), jnp.zeros((2, 12), jnp.int32)
    i, t, s, g = f1(variables, img, txt)
    assert np.asarray(i).shape == (2, 32)


class _ListLoader:
    """Yields prebuilt batches (ragged final batch included)."""

    def __init__(self, batches):
        self._batches = batches
        self.num_samples = sum(b["images"].shape[0] for b in batches)

    def __iter__(self):
        return iter(self._batches)


def _retrieval_batches(seed=0):
    rng = np.random.default_rng(seed)
    batches = []
    pid = 0
    for bsz in (6, 6, 3):  # 15 caption rows, ragged tail (not mesh-divisible)
        imgs = rng.normal(size=(bsz, 16, 16, 3)).astype(np.float32)
        txts = rng.integers(1, 63, size=(bsz, 12)).astype(np.int32)
        paths = []
        for _ in range(bsz):
            paths.append(f"img_{pid // 5:03d}.jpg")  # 5 captions per image
            pid += 1
        batches.append({"images": imgs, "texts": txts, "image_path": paths})
    return batches


def test_evaluate_mesh_sharded_matches_single_device():
    """mesh=... pads ragged batches to the data-axis size, shards the encode,
    slices padding back off — metrics must equal the 1-device path."""
    from refining_clip_via_dinov2_representations_tpu.parallel.mesh import (
        create_mesh,
    )

    model, variables = _model_and_vars()
    args = _args(val_frequency=1, epochs=1)

    data1 = {"val": types.SimpleNamespace(dataloader=_ListLoader(_retrieval_batches()))}
    m_single = evaluate(model, variables, data1, epoch=1, args=args)

    mesh = create_mesh(data=4, model=2)
    data2 = {"val": types.SimpleNamespace(dataloader=_ListLoader(_retrieval_batches()))}
    m_mesh = evaluate(model, variables, data2, epoch=1, args=args, mesh=mesh)

    assert m_single.keys() == m_mesh.keys()
    for k in m_single:
        np.testing.assert_allclose(
            m_mesh[k], m_single[k], atol=1e-5, rtol=1e-5, err_msg=k
        )
    assert "clip_val_loss" in m_single


def test_zero_shot_run_mesh_sharded_matches_single_device():
    """zero_shot.run with a mesh: padded/sharded scoring equals 1-device."""
    from refining_clip_via_dinov2_representations_tpu.parallel.mesh import (
        create_mesh,
    )
    from refining_clip_via_dinov2_representations_tpu.train.zero_shot import run

    model, variables = _model_and_vars()
    rng = np.random.default_rng(3)
    classifier = rng.normal(size=(32, 10)).astype(np.float32)

    def batches():
        out = []
        for bsz in (6, 5):  # ragged, not divisible by 4
            out.append({
                "images": rng.normal(size=(bsz, 16, 16, 3)).astype(np.float32),
                "labels": rng.integers(0, 10, size=(bsz,)),
            })
        return out

    args = _args(val_frequency=1)
    b1 = batches()
    rng = np.random.default_rng(3)  # regenerate identical batches
    classifier2 = rng.normal(size=(32, 10)).astype(np.float32)
    b2 = batches()

    t1, t5 = run(model, variables, classifier, _ListLoader(b1), args)
    mesh = create_mesh(data=4, model=2)
    m1, m5 = run(model, variables, classifier2, _ListLoader(b2), args, mesh=mesh)
    assert (t1, t5) == (m1, m5)
