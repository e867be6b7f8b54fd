"""`save_for_hf` artifact layout (reference `push_to_hf_hub.py:58-82`):
config JSON + torch-layout weights must reload through `load_checkpoint`."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from refining_clip_via_dinov2_representations_tpu.constants import (
    HF_CONFIG_NAME,
    HF_SAFE_WEIGHTS_NAME,
)
from refining_clip_via_dinov2_representations_tpu.models import (
    build_model,
    load_checkpoint,
    parse_model_cfg,
)
from refining_clip_via_dinov2_representations_tpu.models.push_to_hf_hub import (
    save_for_hf,
)

TINY_CFG = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 16, "patch_size": 8, "width": 32, "layers": 2, "head_width": 16},
    "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 4, "layers": 2},
}


def test_save_for_hf_artifacts_reload(tmp_path):
    model = build_model(parse_model_cfg(TINY_CFG))
    rng = np.random.default_rng(0)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 12), jnp.int32)
    )
    variables = {
        "params": jax.tree_util.tree_map(
            lambda a: jnp.asarray(rng.normal(size=a.shape), a.dtype),
            variables["params"],
        )
    }

    save_for_hf(
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        model_cfg=TINY_CFG, tokenizer=None, save_directory=str(tmp_path),
    )
    cfg_file = tmp_path / HF_CONFIG_NAME
    weights = tmp_path / HF_SAFE_WEIGHTS_NAME
    assert cfg_file.exists() and weights.exists()
    hf_cfg = json.loads(cfg_file.read_text())
    assert hf_cfg["model_cfg"] == TINY_CFG
    assert "mean" in hf_cfg["preprocess_cfg"]

    # the safetensors weights reload losslessly into a fresh model
    fresh = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 12), jnp.int32)
    )
    loaded, (missing, unexpected) = load_checkpoint(model, fresh, str(weights))
    assert not missing and not unexpected
    import chex
    chex.assert_trees_all_close(
        jax.tree_util.tree_map(np.asarray, loaded["params"]),
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        atol=1e-6,
    )
