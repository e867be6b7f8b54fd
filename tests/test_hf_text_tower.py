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


class _Out:
    """Minimal stand-in for a transformers ModelOutput."""

    def __init__(self, hidden, pooler_output=None):
        self.last_hidden_state = hidden
        if pooler_output is not None:
            self.pooler_output = pooler_output


def test_poolers_math():
    rng = np.random.default_rng(1)
    hidden = jnp.asarray(rng.normal(size=(2, 4, 8)), jnp.float32)
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]], jnp.int32)
    out = _Out(hidden)
    mp = mean_pooler(out, mask)
    np.testing.assert_allclose(
        np.asarray(mp[0]), np.asarray(hidden[0, :2]).mean(0), atol=1e-6
    )
    xp = max_pooler(out, mask)
    np.testing.assert_allclose(
        np.asarray(xp[0]), np.asarray(hidden[0, :2]).max(0), atol=1e-6
    )
    # without a model pooler head: raw CLS hidden state
    np.testing.assert_allclose(np.asarray(cls_pooler(out, mask)), np.asarray(hidden[:, 0]))
    # with one: the tanh-dense pooler_output wins (reference ClsPooler,
    # hf_model.py:72-80 with use_pooler_output=True)
    po = jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(cls_pooler(_Out(hidden, po), mask)), np.asarray(po)
    )


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
    want = mean_pooler(_Out(jnp.asarray(direct)), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pad_id_resolves_from_hf_config():
    """The attention mask uses the config's pad_token_id (reference
    `hf_model.py:156`) — a roberta-style pad_token_id=1 must not mask BOS
    (token 0) nor attend real padding."""
    from transformers import BertConfig, FlaxBertModel

    cfg = BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, pad_token_id=1,
    )
    hf = FlaxBertModel(cfg, seed=0)
    tower = HFTextEncoder(
        hf_module=hf.module, output_dim=32, pooler_type="mean_pooler",
        proj_type="none",
    )
    ids = np.full((1, 8), 1, np.int32)  # all padding (id 1)
    ids[0, :3] = [0, 5, 6]  # BOS + two real tokens
    ids = jnp.asarray(ids)
    variables = tower.init(jax.random.PRNGKey(0), ids)
    variables = {"params": {**variables["params"], "transformer": hf.params}}
    got = tower.apply(variables, ids)

    mask = (np.asarray(ids) != 1).astype(np.int32)
    direct = hf(input_ids=np.asarray(ids), attention_mask=mask).last_hidden_state
    want = np.asarray(direct)[0, :3].mean(0)
    np.testing.assert_allclose(np.asarray(got[0]), want, atol=2e-5)


def test_proj_resolution_matches_reference():
    """Reference `hf_model.py:142-158`: no proj only for equal dims +
    proj unset; 'mlp' builds the head even when dims match."""
    hf = _tiny_bert()  # hidden 32

    # equal dims + proj None -> Identity (no proj params)
    tower = HFTextEncoder(hf_module=hf.module, output_dim=32, proj_type=None)
    v = tower.init(jax.random.PRNGKey(0), _ids())
    assert not any(k.startswith("proj") for k in v["params"])

    # equal dims + mlp -> MLP params exist and transform the output
    tower = HFTextEncoder(hf_module=hf.module, output_dim=32, proj_type="mlp")
    v = tower.init(jax.random.PRNGKey(0), _ids())
    assert "proj_fc1" in v["params"] and "proj_fc2" in v["params"]

    # unequal dims + proj None -> explicit error (reference crashes too)
    tower = HFTextEncoder(hf_module=hf.module, output_dim=16, proj_type=None)
    with pytest.raises(ValueError, match="hf_proj_type"):
        tower.init(jax.random.PRNGKey(0), _ids())


def test_output_tokens_strips_cls_for_cls_pooler():
    """Reference returns the token stream without the CLS position for
    ClsPooler towers (`hf_model.py:160-164`)."""
    hf = _tiny_bert()
    ids = _ids()

    tower = HFTextEncoder(
        hf_module=hf.module, output_dim=32, pooler_type="cls_pooler",
        proj_type="none", output_tokens=True,
    )
    v = tower.init(jax.random.PRNGKey(0), ids)
    _, tokens = tower.apply(v, ids)
    assert tokens.shape[1] == ids.shape[1] - 1

    tower = HFTextEncoder(
        hf_module=hf.module, output_dim=32, pooler_type="mean_pooler",
        proj_type="none", output_tokens=True,
    )
    v = tower.init(jax.random.PRNGKey(0), ids)
    _, tokens = tower.apply(v, ids)
    assert tokens.shape[1] == ids.shape[1]


def test_factory_overlays_pretrained_hf_text_params(tmp_path):
    """`create_model` transplants hub weights into the text tower
    (reference loads them in-constructor, `hf_model.py:121-127`): features
    from the factory-built model must match the raw flax model, not a
    random init."""
    import refining_clip_via_dinov2_representations_tpu as oc
    from refining_clip_via_dinov2_representations_tpu.models import (
        register_model_config,
    )

    hf = _tiny_bert()
    local = tmp_path / "tiny-bert"
    hf.save_pretrained(local)  # local dir => offline from_pretrained works

    register_model_config(
        "tiny-hf-text-clip",
        {
            "embed_dim": 32,
            "vision_cfg": {
                "image_size": 32, "patch_size": 8, "width": 48,
                "layers": 2, "head_width": 24,
            },
            "text_cfg": {
                "hf_model_name": str(local),
                "hf_pooler_type": "mean_pooler",
                "hf_proj_type": None,
                "context_length": 10,
                "vocab_size": 64,
            },
        },
    )
    model, variables, _ = oc.create_model("tiny-hf-text-clip")
    got = np.asarray(
        variables["params"]["text"]["transformer"]["embeddings"]["word_embeddings"][
            "embedding"
        ]
    )
    want = np.asarray(hf.params["embeddings"]["word_embeddings"]["embedding"])
    np.testing.assert_allclose(got, want)
