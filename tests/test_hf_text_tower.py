"""HF flax text tower (`models/hf_model.py`, reference `hf_model.py:96-193`):
poolers, projection variants, and parity vs the flax BERT model run directly.
Offline-safe: builds from a local BertConfig, no hub download.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")

from refining_clip_via_dinov2_representations_tpu.models.hf_model import (
    HFTextEncoder,
    cls_pooler,
    max_pooler,
    mean_pooler,
)


def _tiny_bert():
    from transformers import BertConfig, FlaxBertModel

    cfg = BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32,
    )
    return FlaxBertModel(cfg, seed=0)


def _ids(b=2, l=10, pad_from=7):
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 63, size=(b, l)).astype(np.int32)
    ids[:, pad_from:] = 0  # pad tail
    return jnp.asarray(ids)


def test_poolers_math():
    rng = np.random.default_rng(1)
    hidden = jnp.asarray(rng.normal(size=(2, 4, 8)), jnp.float32)
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]], jnp.int32)
    mp = mean_pooler(hidden, mask)
    np.testing.assert_allclose(
        np.asarray(mp[0]), np.asarray(hidden[0, :2]).mean(0), atol=1e-6
    )
    xp = max_pooler(hidden, mask)
    np.testing.assert_allclose(
        np.asarray(xp[0]), np.asarray(hidden[0, :2]).max(0), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(cls_pooler(hidden, mask)), np.asarray(hidden[:, 0]))


@pytest.mark.parametrize("proj", ["linear", "mlp"])
def test_hf_text_tower_forward_and_proj(proj):
    hf = _tiny_bert()
    tower = HFTextEncoder(
        hf_module=hf.module, output_dim=16, pooler_type="mean_pooler",
        proj_type=proj,
    )
    ids = _ids()
    variables = tower.init(jax.random.PRNGKey(0), ids)
    out = tower.apply(variables, ids)
    assert out.shape == (2, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_hf_text_tower_matches_direct_flax_model():
    """The wrapped transformer (params transplanted) reproduces the raw
    FlaxBertModel hidden states through the mean pooler."""
    hf = _tiny_bert()
    tower = HFTextEncoder(
        hf_module=hf.module, output_dim=32, pooler_type="mean_pooler",
        proj_type="none",
    )
    ids = _ids()
    variables = tower.init(jax.random.PRNGKey(0), ids)
    # transplant the real BERT params into the tower's 'transformer' scope
    variables = {"params": {**variables["params"], "transformer": hf.params}}
    got = tower.apply(variables, ids)

    mask = (np.asarray(ids) != 0).astype(np.int32)
    direct = hf(input_ids=np.asarray(ids), attention_mask=mask).last_hidden_state
    want = mean_pooler(jnp.asarray(direct), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
