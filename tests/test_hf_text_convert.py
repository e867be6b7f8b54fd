"""HF-text CLIP checkpoint conversion (roberta/bert-family hub checkpoints,
e.g. laion/CLIP-ViT-B-32-roberta-base): torch reference CustomTextCLIP with an
HF text tower → flax tree → forward parity, plus export roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.models import (
    build_model,
    parse_model_cfg,
)
from refining_clip_via_dinov2_representations_tpu.models.convert import (
    convert_clip_state_dict,
    flax_params_to_torch_state_dict,
)
from tests.ref_loader import load_ref, reference_available

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)


@pytest.fixture(scope="module")
def tiny_bert_dir(tmp_path_factory):
    """A local torch BERT checkpoint (loadable offline by both frameworks)."""
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32,
    )
    torch.manual_seed(0)
    model = BertModel(cfg)
    d = tmp_path_factory.mktemp("hf") / "tiny-bert"
    model.save_pretrained(d, safe_serialization=False)
    return str(d)


def _cfg(tiny_bert_dir):
    return {
        "embed_dim": 16,
        "vision_cfg": {
            "image_size": 32, "patch_size": 8, "width": 48,
            "layers": 2, "head_width": 24,
        },
        "text_cfg": {
            "hf_model_name": tiny_bert_dir,
            "hf_pooler_type": "mean_pooler",
            "hf_proj_type": "mlp",
            "context_length": 10,
            "vocab_size": 64,
        },
    }


def _ids():
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 63, size=(2, 10)).astype(np.int32)
    ids[:, 7:] = 0
    return ids


def test_reference_hf_text_checkpoint_parity(tiny_bert_dir):
    """Load the torch reference's CustomTextCLIP-with-HF-text state dict and
    match its encode_text on identical ids (converter `_convert_hf_text_leaf`
    vs reference `hf_model.py` forward)."""
    ref_model_mod = load_ref("model")
    cfg = _cfg(tiny_bert_dir)
    torch.manual_seed(1)
    ref = ref_model_mod.CustomTextCLIP(
        embed_dim=cfg["embed_dim"],
        vision_cfg=ref_model_mod.CLIPVisionCfg(**cfg["vision_cfg"]),
        text_cfg=ref_model_mod.CLIPTextCfg(**cfg["text_cfg"]),
    )
    ref.eval()
    sd = ref.state_dict()
    assert any(k.startswith("text.transformer.embeddings.") for k in sd)

    model = build_model(parse_model_cfg(cfg))
    ids = _ids()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.asarray(ids[:1])
    )
    params = convert_clip_state_dict(sd)
    # converted tree must match the initialized structure exactly
    a = jax.tree_util.tree_structure(variables["params"])
    b = jax.tree_util.tree_structure(params)
    assert a == b, (a, b)

    with torch.no_grad():
        want = ref.encode_text(torch.from_numpy(ids.astype(np.int64))).numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids), method="encode_text")
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_hf_text_export_roundtrip(tiny_bert_dir):
    """flax HF-text CLIP params → torch CustomTextCLIP layout → flax again is
    lossless, and the exported keys use the reference's Sequential proj
    naming (text.proj.0/2)."""
    cfg = _cfg(tiny_bert_dir)
    model = build_model(parse_model_cfg(cfg))
    rng = np.random.default_rng(0)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 10), jnp.int32),
    )
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape), a.dtype), variables
    )
    sd = flax_params_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, variables["params"])
    )
    assert "text.proj.0.weight" in sd and "text.proj.2.weight" in sd
    assert "text.transformer.embeddings.word_embeddings.weight" in sd
    back = convert_clip_state_dict(sd)
    import chex

    chex.assert_trees_all_close(
        jax.tree_util.tree_map(jnp.asarray, back),
        jax.tree_util.tree_map(jnp.asarray, variables["params"]),
        atol=1e-6,
    )
