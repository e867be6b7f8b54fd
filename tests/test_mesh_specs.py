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
    # DINOv2 teacher: plain MLP (fc1/fc2 on the block) and the giant's
    # packed SwiGLU (mlp/weights_in|weights_out) both shard
    assert _spec("blocks_7/fc1/kernel") == P(None, "model")
    assert _spec("blocks_7/fc2/kernel") == P("model", None)
    assert _spec("blocks_7/mlp/weights_in/kernel") == P(None, "model")
    assert _spec("blocks_7/mlp/weights_out/kernel") == P("model", None)
    assert _spec("blocks_7/attn/in_proj_kernel") == P(None, "model")


def test_replicated_fallbacks():
    # 1-D params and unmatched names stay replicated
    assert _spec("visual/ln_post/scale", shape=(8,)) == P()
    assert _spec("visual/conv1/kernel", shape=(16, 16, 3, 8)) == P()
    assert _spec("visual/positional_embedding") == P()
    assert _spec("logit_scale", shape=()) == P()


def test_opt_state_moments_follow_tp_sharding():
    """AdamW moments of a model-axis-sharded param must carry the same
    model-axis placement (no per-step reshard), with ZeRO data-sharding
    layered on the free axis (ADVICE r2: parallel/mesh.py:181)."""
    import jax
    import optax

    from refining_clip_via_dinov2_representations_tpu.parallel.mesh import (
        create_mesh,
        opt_state_shardings,
    )

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(data=4, model=2)
    params = {
        "model": {
            "visual": {
                "resblocks_0": {
                    "mlp": {
                        "c_fc": {"kernel": np.zeros((256, 1024), np.float32)},
                        "c_proj": {"kernel": np.zeros((1024, 256), np.float32)},
                    }
                },
                "positional_embedding": np.zeros((197, 256), np.float32),
            }
        }
    }
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    sh = opt_state_shardings(opt_state, mesh, min_size=2**10)
    flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): s
        for path, s in jax.tree_util.tree_leaves_with_path(sh)
    }
    for name, s in flat.items():
        if "c_fc" in name and ("mu" in name or "nu" in name):
            assert s.spec == P("data", "model"), (name, s.spec)
        if "c_proj" in name and ("mu" in name or "nu" in name):
            assert s.spec == P("model", "data"), (name, s.spec)
        if "positional_embedding" in name and ("mu" in name or "nu" in name):
            # 197 not divisible by 4 -> replicated over data, no TP match
            assert s.spec in (P(), P(None)), (name, s.spec)


def test_fsdp_param_specs():
    """FSDP layers the data axis onto param specs: column-parallel leaves on
    axis 0, row-parallel on axis 1, unsharded big leaves on axis 0;
    non-divisible or small leaves keep their TP-only spec."""
    import jax
    import pytest

    from refining_clip_via_dinov2_representations_tpu.parallel.mesh import (
        create_mesh,
        param_shardings,
    )

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    params = {
        "visual": {
            "resblocks_0": {
                "mlp": {
                    "c_fc": {"kernel": np.zeros((256, 1024), np.float32)},
                    "c_proj": {"kernel": np.zeros((1024, 256), np.float32)},
                },
                "ln_1": {"scale": np.zeros((256,), np.float32)},
            },
            "positional_embedding": np.zeros((197, 256), np.float32),
            "conv1": {"kernel": np.zeros((16, 16, 3, 256), np.float32)},
        },
        "logit_scale": np.zeros((), np.float32),
    }

    mesh = create_mesh(data=4, model=2)
    sh = {
        "/".join(str(getattr(p, "key", p)) for p in path): s.spec
        for path, s in jax.tree_util.tree_leaves_with_path(
            param_shardings(params, mesh, fsdp=True, min_size=0)
        )
    }
    assert sh["visual/resblocks_0/mlp/c_fc/kernel"] == P("data", "model")
    assert sh["visual/resblocks_0/mlp/c_proj/kernel"] == P("model", "data")
    # unmatched 4-D conv kernel: data on axis 0 (16 % 4 == 0)
    assert sh["visual/conv1/kernel"] == P("data")
    # 197 rows not divisible by 4 -> stays replicated
    assert sh["visual/positional_embedding"] == P()
    # 1-D scale: 256 % 4 == 0 and min_size=0 -> data-sharded
    assert sh["visual/resblocks_0/ln_1/scale"] == P("data")
    assert sh["logit_scale"] == P()

    # default min_size (2**16) keeps small leaves whole
    sh_default = {
        "/".join(str(getattr(p, "key", p)) for p in path): s.spec
        for path, s in jax.tree_util.tree_leaves_with_path(
            param_shardings(params, mesh, fsdp=True)
        )
    }
    assert sh_default["visual/resblocks_0/ln_1/scale"] == P()
    assert sh_default["visual/resblocks_0/mlp/c_fc/kernel"] == P("data", "model")

    # data-parallel-only mesh: pure ZeRO-3, no model axis anywhere
    mesh_dp = create_mesh(data=8, model=1)
    sh_dp = {
        "/".join(str(getattr(p, "key", p)) for p in path): s.spec
        for path, s in jax.tree_util.tree_leaves_with_path(
            param_shardings(params, mesh_dp, fsdp=True, min_size=0)
        )
    }
    assert sh_dp["visual/resblocks_0/mlp/c_fc/kernel"] == P("data")
    assert sh_dp["visual/resblocks_0/mlp/c_proj/kernel"] == P("data")


def test_multislice_device_array():
    """Multi-slice pods (distinct `slice_index`, ICI+DCN): the DCN axis lands
    on the outer blocks of the data dimension and the model (TP) axis stays
    inside one slice — TP all-reduces never cross DCN."""
    from refining_clip_via_dinov2_representations_tpu.parallel.mesh import (
        _device_array,
    )

    class FakeDev:
        def __init__(self, i, sl):
            self.id = i
            self.slice_index = sl
            self.process_index = sl
            self.platform = "cpu"
            self.device_kind = "cpu"

    devs = [FakeDev(i, i // 4) for i in range(8)]  # 2 slices x 4 devices

    arr = _device_array(8, 1, devs)
    assert arr.shape == (8, 1)
    # pure DP: slice 0's devices fill the first data block
    assert [d.slice_index for d in arr.ravel()] == [0] * 4 + [1] * 4

    arr2 = _device_array(4, 2, devs)
    assert arr2.shape == (4, 2)
    for row in arr2:
        # each TP pair lives in ONE slice
        assert row[0].slice_index == row[1].slice_index
    assert [row[0].slice_index for row in arr2] == [0, 0, 1, 1]

    # model axis may never span DCN: TP=8 > one slice's 4 devices -> error
    import pytest

    with pytest.raises(AssertionError):
        _device_array(1, 8, devs)


def test_put_full_batch_matches_device_put():
    """put_full_batch (eval/serving staging of batches every process holds in
    full) must produce the same sharded global array via both its paths: the
    single-process device_put and the multi-host make_array_from_callback
    (exercised here directly — real multi-process coverage is in
    tests/test_multihost.py's spawned runs)."""
    import jax
    import pytest

    from refining_clip_via_dinov2_representations_tpu.parallel.mesh import (
        batch_sharding, create_mesh, put_full_batch,
    )

    if jax.device_count() < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    mesh = create_mesh(model=2)
    shard = batch_sharding(mesh)
    x = np.arange(8 * 3 * 5, dtype=np.float32).reshape(8, 3, 5)

    via_put = put_full_batch(x, shard)
    assert via_put.sharding.is_equivalent_to(shard, x.ndim)
    np.testing.assert_array_equal(np.asarray(via_put), x)

    via_cb = jax.make_array_from_callback(x.shape, shard, lambda idx: x[idx])
    np.testing.assert_array_equal(np.asarray(via_cb), x)
    assert via_cb.sharding.is_equivalent_to(via_put.sharding, x.ndim)
