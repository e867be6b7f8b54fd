"""Tensor-parallel param-spec rules (`parallel/mesh.py:_param_spec`)."""

import numpy as np

from jax.sharding import PartitionSpec as P

from refining_clip_via_dinov2_representations_tpu.parallel.mesh import _param_spec


def _spec(path_str, shape=(8, 8)):
    return _param_spec(tuple(path_str.split("/")), np.zeros(shape))


def test_clip_vit_rules():
    assert _spec("visual/transformer/resblocks_0/mlp/c_fc/kernel") == P(None, "model")
    assert _spec("visual/transformer/resblocks_0/mlp/c_proj/kernel") == P("model", None)
    assert _spec("visual/transformer/resblocks_0/attn/in_proj_kernel") == P(None, "model")
    assert _spec("visual/transformer/resblocks_0/attn/out_proj/kernel") == P("model", None)
    assert _spec("text/token_embedding/embedding") == P(None, "model")


def test_timm_family_rules():
    # SigLIP encoder MLP + MAP head
    assert _spec("visual/layers_3/fc1/kernel") == P(None, "model")
    assert _spec("visual/layers_3/fc2/kernel") == P("model", None)
    assert _spec("visual/head_fc1/kernel") == P(None, "model")
    assert _spec("visual/head_fc2/kernel") == P("model", None)
    # EVA02 SwiGLU gate/value up-projections
    assert _spec("visual/resblocks_2/mlp/fc1_g/kernel") == P(None, "model")
    assert _spec("visual/resblocks_2/mlp/fc1_x/kernel") == P(None, "model")
    assert _spec("visual/resblocks_2/mlp/fc2/kernel") == P("model", None)


def test_replicated_fallbacks():
    # 1-D params and unmatched names stay replicated
    assert _spec("visual/ln_post/scale", shape=(8,)) == P()
    assert _spec("visual/conv1/kernel", shape=(16, 16, 3, 8)) == P()
    assert _spec("visual/positional_embedding") == P()
    assert _spec("logit_scale", shape=()) == P()
