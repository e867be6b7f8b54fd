"""Native flax M2M100/NLLB encoder (`models/m2m100.py`) vs the torch
`M2M100Model` encoder oracle, plus the offline HF-config fallback table.

The reference wraps NLLB through torch AutoModel (`hf_model.py:96-193` with
the `hf_configs.py` m2m_100 entry); transformers has no flax M2M100, so the
rebuild ships its own — parity here is the proof it's the same architecture.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from refining_clip_via_dinov2_representations_tpu.models.m2m100 import (
    FlaxM2M100EncoderModule,
    convert_m2m100_encoder_state_dict,
    position_ids_from_input_ids,
    sinusoidal_positions,
)


def _tiny_cfg():
    from transformers import M2M100Config

    return M2M100Config(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_ffn_dim=48, decoder_ffn_dim=48, encoder_attention_heads=4,
        decoder_attention_heads=4, max_position_embeddings=32,
        scale_embedding=True, activation_function="relu", pad_token_id=1,
        bos_token_id=0, eos_token_id=2, decoder_start_token_id=2, dropout=0.0,
    )


def _ids(cfg, b=3, l=12, pad_from=9):
    rng = np.random.default_rng(0)
    ids = rng.integers(3, cfg.vocab_size - 1, size=(b, l)).astype(np.int32)
    ids[1, pad_from:] = cfg.pad_token_id
    ids[2, pad_from - 3:] = cfg.pad_token_id
    return ids


def test_sinusoidal_table_matches_torch():
    from transformers.models.m2m_100.modeling_m2m_100 import (
        M2M100SinusoidalPositionalEmbedding,
    )

    emb = M2M100SinusoidalPositionalEmbedding(30, 16, padding_idx=1)
    ref = emb.weights.detach().numpy()
    ours = sinusoidal_positions(ref.shape[0], 16, padding_idx=1)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_position_ids_match_torch_convention():
    cfg = _tiny_cfg()
    ids = _ids(cfg)
    mask = (ids != cfg.pad_token_id).astype(np.int64)
    expected = np.cumsum(mask, axis=1) * mask + cfg.pad_token_id
    got = np.asarray(position_ids_from_input_ids(jnp.asarray(ids), cfg.pad_token_id))
    np.testing.assert_array_equal(got, expected)


def test_encoder_parity_vs_torch_m2m100():
    """Converted random torch weights -> identical last_hidden_state."""
    from transformers import M2M100Model

    cfg = _tiny_cfg()
    torch.manual_seed(0)
    ref = M2M100Model(cfg).eval()
    ids = _ids(cfg)
    mask = (ids != cfg.pad_token_id).astype(np.int64)
    with torch.no_grad():
        ref_out = ref.encoder(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()

    params = convert_m2m100_encoder_state_dict(ref.state_dict())
    module = FlaxM2M100EncoderModule(config=cfg)
    out = module.apply({"params": params}, jnp.asarray(ids)).last_hidden_state
    # padded rows diverge (torch leaves pad positions unmasked in outputs the
    # same way — compare everything)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5)


def test_nllb_clip_tower_builds_and_abstract_inits():
    """nllb-clip-base abstract-inits offline end-to-end: the registry config
    resolves through the frozen architecture table, the m2m_100 text tower is
    the native flax encoder, and features land at embed_dim."""
    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model,
        get_model_config,
        parse_model_cfg,
    )

    cfg = parse_model_cfg(get_model_config("nllb-clip-base"))
    model = build_model(cfg)
    img = jax.ShapeDtypeStruct((1, 224, 224, 3), jnp.float32)
    txt = jax.ShapeDtypeStruct((1, cfg.text_cfg.context_length), jnp.int32)
    vs = jax.eval_shape(model.init, jax.random.PRNGKey(0), img, txt)
    out = jax.eval_shape(model.apply, vs, img, txt)
    assert out["text_features"].shape == (1, cfg.embed_dim)


def test_offline_hf_config_table_matches_cached_when_available():
    """The frozen table must agree with the hub config whenever one IS
    cached; otherwise the offline build would silently diverge. (On hosts
    with no cache this degenerates to a table self-consistency check.)"""
    from refining_clip_via_dinov2_representations_tpu.models.hf_model import (
        _OFFLINE_HF_CONFIGS,
        resolve_hf_config,
    )
    from transformers import AutoConfig

    for name, known in _OFFLINE_HF_CONFIGS.items():
        got = resolve_hf_config(name)
        assert got.model_type == known["model_type"]
        try:
            cached = AutoConfig.from_pretrained(name, local_files_only=True)
        except Exception:
            continue
        for key, val in known.items():
            if key == "model_type":
                continue
            assert getattr(cached, key) == val, (name, key, val)


def test_dropout_active_in_training_mode():
    """deterministic=False applies the config's dropout (the torch encoder
    regularizes with p=cfg.dropout at embeddings and every sublayer output);
    deterministic=True stays exact/reproducible."""
    from transformers import M2M100Config

    cfg = M2M100Config(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_ffn_dim=48, decoder_ffn_dim=48, encoder_attention_heads=4,
        decoder_attention_heads=4, max_position_embeddings=32,
        scale_embedding=True, activation_function="relu", pad_token_id=1,
        dropout=0.5, attention_dropout=0.1,
    )
    ids = jnp.asarray(_ids(cfg))
    mod = FlaxM2M100EncoderModule(config=cfg, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), ids)

    det = mod.apply(params, ids).last_hidden_state
    det2 = mod.apply(params, ids).last_hidden_state
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))

    tr1 = mod.apply(
        params, ids, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    ).last_hidden_state
    tr2 = mod.apply(
        params, ids, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    ).last_hidden_state
    # different dropout draws -> different activations; and both differ from eval
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))
    assert not np.allclose(np.asarray(tr1), np.asarray(det))
