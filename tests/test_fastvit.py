"""FastViT / MCi tower structural tests (no timm/checkpoint oracle in this
environment — see models/fastvit.py ORACLE STATUS). The strongest internal
check is the structural-reparameterization identity: the multi-branch
MobileOne block must equal a single fused conv, a mathematical property we
verify numerically without any external reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.models.fastvit import (
    FASTVIT_DIMS,
    FastVitCfg,
    FastVitTower,
    MciVisionTransformer,
    MobileOneBlock,
    convert_timm_fastvit_state_dict,
    convert_timm_mci_vit_state_dict,
)

TINY = FastVitCfg(layers=(1, 1, 1, 1), embed_dims=(8, 16, 32, 64), image_size=64)


def test_fastvit_shapes_and_structure():
    tower = FastVitTower(cfg=TINY, output_dim=20, output_tokens=True)
    x = jnp.zeros((2, 64, 64, 3))
    v = tower.init(jax.random.PRNGKey(0), x)
    pooled, tokens = tower.apply(v, x)
    assert pooled.shape == (2, 20)
    # 64/32 = 2x2 grid, final_conv = 2x embed_dims[-1]
    assert tokens.shape == (2, 4, 128)

    p = v["params"]
    # stem: 3 MobileOne blocks; block 2 (1x1 s1, in==out) has identity BN
    assert "conv_kxk_0_conv" in p["stem_0"] and "conv_scale_conv" in p["stem_0"]
    assert "identity" not in p["stem_0"]          # stride 2
    assert "identity" in p["stem_2"]              # 1x1 stride 1
    assert "conv_scale_conv" not in p["stem_2"]   # kernel 1 -> no scale branch
    # repmixer: norm branch is identity-BN only
    tm = p["stage0_block0"]["token_mixer"]
    assert set(tm["norm"]) == {"identity"}
    assert "conv_kxk_0_conv" in tm["mixer"]
    # attention stage has RepCPE + qkv/proj, SE on late downsamplers only
    assert "pos_enc" in p["stage3_pos_emb"]
    assert "qkv" in p["stage3_block0"]["token_mixer"]
    assert "se" in p["stage2_downsample"]["proj_0"]
    assert "se" not in p["stage1_downsample"]["proj_0"]
    # final conv carries SE; head is the CLIP projection
    assert "se" in p["final_conv"]
    assert p["head_fc"]["kernel"].shape == (128, 20)


def test_fastvit_train_mode_updates_batch_stats():
    tower = FastVitTower(cfg=TINY, output_dim=8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
    v = tower.init(jax.random.PRNGKey(0), x)
    _, mut = tower.apply(v, x, False, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(v["batch_stats"])
    after = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(after, before)
    )


def _fuse_branch(kernel, scale, bn_vars, eps=1e-5):
    """Fold BN (scale s, bias b, mean m, var v) into conv weights."""
    s, b, m, var = bn_vars
    std = np.sqrt(var + eps)
    w = kernel * (s / std)[None, None, None, :]
    bias = b - m * s / std
    return w, bias


def test_mobileone_reparam_identity():
    """Eval-mode multi-branch output == single fused conv output.

    Fuses each [conv+BN] branch, pads the 1x1 scale branch to kxk, expresses
    the identity BN as a (grouped) identity kernel, sums — the deploy-time
    reparameterization MobileOne/FastViT rely on (and XLA performs
    implicitly). Verifies our branch arithmetic is the reparameterizable
    form."""
    rng = np.random.default_rng(1)
    dim, k = 6, 3
    block = MobileOneBlock(out_chs=dim, kernel_size=k, groups=dim, use_act=False)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, dim)), jnp.float32)
    v = block.init(jax.random.PRNGKey(0), x)
    # randomize batch_stats so BN folding is non-trivial
    bs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) ** 2 + 0.5, a.dtype)
        if a.ndim else a, v["batch_stats"])
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape), a.dtype), v["params"])
    v = {"params": params, "batch_stats": bs}
    out = block.apply(v, x)

    p, s = jax.tree_util.tree_map(np.asarray, (v["params"], v["batch_stats"]))

    def bn_vars(name):
        return (p[name]["scale"], p[name]["bias"], s[name]["mean"], s[name]["var"])

    # branch 1: kxk conv (+BN). depthwise layout HWIO with I=1
    w_kxk, b_kxk = _fuse_branch(p["conv_kxk_0_conv"]["kernel"], None, bn_vars("conv_kxk_0_bn"))
    # branch 2: 1x1 conv (+BN), zero-padded to kxk
    w_s, b_s = _fuse_branch(p["conv_scale_conv"]["kernel"], None, bn_vars("conv_scale_bn"))
    w_s_pad = np.zeros_like(w_kxk)
    w_s_pad[k // 2, k // 2] = w_s[0, 0]
    # branch 3: identity BN as a centered depthwise identity kernel
    sc, bi, m, var = bn_vars("identity")
    std = np.sqrt(var + 1e-5)
    w_id = np.zeros_like(w_kxk)
    w_id[k // 2, k // 2, 0, :] = sc / std
    b_id = bi - m * sc / std

    w = jnp.asarray(w_kxk + w_s_pad + w_id)
    b = jnp.asarray(b_kxk + b_s + b_id)
    fused = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], feature_group_count=dim,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    np.testing.assert_allclose(np.asarray(out), np.asarray(fused), atol=1e-5)


_COUNTER = [0]


def _torchlike(shape, positive=False):
    _COUNTER[0] += 1
    v = np.random.default_rng(_COUNTER[0]).normal(size=shape).astype(np.float32)
    return np.abs(v) + 0.5 if positive else v


def _timm_mobileone_keys(prefix, in_chs, out_chs, k, stride, groups, use_se=False,
                         num_conv_branches=1, use_scale_branch=True):
    sd = {}
    for i in range(num_conv_branches):
        sd[f"{prefix}.conv_kxk.{i}.conv.weight"] = _torchlike((out_chs, in_chs // groups, k, k))
        for leaf, shape in (("weight", out_chs), ("bias", out_chs),
                            ("running_mean", out_chs), ("running_var", out_chs)):
            sd[f"{prefix}.conv_kxk.{i}.bn.{leaf}"] = _torchlike((shape,), positive=leaf == "running_var")
    if use_scale_branch and k > 1:
        sd[f"{prefix}.conv_scale.conv.weight"] = _torchlike((out_chs, in_chs // groups, 1, 1))
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{prefix}.conv_scale.bn.{leaf}"] = _torchlike((out_chs,), positive=leaf == "running_var")
    if in_chs == out_chs and stride == 1:
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{prefix}.identity.{leaf}"] = _torchlike((out_chs,), positive=leaf == "running_var")
    if use_se:
        rd = max(1, out_chs // 16)
        sd[f"{prefix}.se.fc1.weight"] = _torchlike((rd, out_chs, 1, 1))
        sd[f"{prefix}.se.fc1.bias"] = _torchlike((rd,))
        sd[f"{prefix}.se.fc2.weight"] = _torchlike((out_chs, rd, 1, 1))
        sd[f"{prefix}.se.fc2.bias"] = _torchlike((out_chs,))
    return sd


def _timm_fastvit_state_dict(cfg: FastVitCfg, output_dim: int):
    """Synthesize a full timm-layout fastvit state dict for cfg."""
    t = "visual.trunk."
    e = cfg.embed_dims
    sd = {}
    sd.update(_timm_mobileone_keys(t + "stem.0", 3, e[0], 3, 2, 1))
    sd.update(_timm_mobileone_keys(t + "stem.1", e[0], e[0], 3, 2, e[0]))
    sd.update(_timm_mobileone_keys(t + "stem.2", e[0], e[0], 1, 1, 1))
    for s in range(4):
        dim = e[s]
        if s > 0:
            d = f"{t}stages.{s}.downsample.proj"
            for name, kk in (("large_conv", 7), ("small_conv", 3)):
                sd[f"{d}.0.{name}.conv.weight"] = _torchlike((dim, 1, kk, kk))
                for leaf in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{d}.0.{name}.bn.{leaf}"] = _torchlike((dim,), positive=leaf == "running_var")
            if cfg.se_downsamples[s]:
                rd = max(1, dim // 4)
                sd[f"{d}.0.se.fc1.weight"] = _torchlike((rd, dim, 1, 1))
                sd[f"{d}.0.se.fc1.bias"] = _torchlike((rd,))
                sd[f"{d}.0.se.fc2.weight"] = _torchlike((dim, rd, 1, 1))
                sd[f"{d}.0.se.fc2.bias"] = _torchlike((dim,))
            sd.update(_timm_mobileone_keys(f"{d}.1", dim, dim, 1, 1, 1))
        if cfg.pos_emb_stages[s]:
            sd[f"{t}stages.{s}.pos_emb.pos_enc.weight"] = _torchlike((dim, 1, 7, 7))
            sd[f"{t}stages.{s}.pos_emb.pos_enc.bias"] = _torchlike((dim,))
        for b in range(cfg.layers[s]):
            bp = f"{t}stages.{s}.blocks.{b}"
            hidden = cfg.mlp_ratios[s] * dim
            sd[f"{bp}.mlp.conv.conv.weight"] = _torchlike((dim, 1, 7, 7))
            for leaf in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{bp}.mlp.conv.bn.{leaf}"] = _torchlike((dim,), positive=leaf == "running_var")
            sd[f"{bp}.mlp.fc1.weight"] = _torchlike((hidden, dim, 1, 1))
            sd[f"{bp}.mlp.fc1.bias"] = _torchlike((hidden,))
            sd[f"{bp}.mlp.fc2.weight"] = _torchlike((dim, hidden, 1, 1))
            sd[f"{bp}.mlp.fc2.bias"] = _torchlike((dim,))
            if cfg.token_mixers[s] == "attention":
                for leaf in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{bp}.norm.{leaf}"] = _torchlike((dim,), positive=leaf == "running_var")
                sd[f"{bp}.token_mixer.qkv.weight"] = _torchlike((3 * dim, dim))
                sd[f"{bp}.token_mixer.proj.weight"] = _torchlike((dim, dim))
                sd[f"{bp}.token_mixer.proj.bias"] = _torchlike((dim,))
                sd[f"{bp}.layer_scale_1.gamma"] = _torchlike((dim, 1, 1))
                sd[f"{bp}.layer_scale_2.gamma"] = _torchlike((dim, 1, 1))
            else:
                sd.update(_timm_mobileone_keys(
                    f"{bp}.token_mixer.mixer", dim, dim, 3, 1, dim))
                sd.update({k: v for k, v in _timm_mobileone_keys(
                    f"{bp}.token_mixer.norm", dim, dim, 3, 1, dim,
                    num_conv_branches=0, use_scale_branch=False).items()})
                sd[f"{bp}.token_mixer.layer_scale.gamma"] = _torchlike((dim, 1, 1))
                sd[f"{bp}.layer_scale.gamma"] = _torchlike((dim, 1, 1))
    final = int(e[-1] * cfg.cls_ratio)
    sd.update(_timm_mobileone_keys(t + "final_conv", e[-1], final, 3, 1, e[-1],
                                   use_se=True))
    sd[t + "head.fc.weight"] = _torchlike((output_dim, final))
    sd[t + "head.fc.bias"] = _torchlike((output_dim,))
    return sd


def test_fastvit_timm_converter_roundtrip():
    """A synthetic timm-layout checkpoint converts onto exactly the tower's
    init tree (same structure, same shapes) and the loaded model runs."""
    import chex

    tower = FastVitTower(cfg=TINY, output_dim=20)
    x = jnp.zeros((1, 64, 64, 3))
    init_v = tower.init(jax.random.PRNGKey(0), x)
    sd = _timm_fastvit_state_dict(TINY, output_dim=20)
    conv = convert_timm_fastvit_state_dict(sd)
    chex.assert_trees_all_equal_shapes(
        init_v["params"], jax.tree_util.tree_map(jnp.asarray, conv["params"]))
    chex.assert_trees_all_equal_shapes(
        init_v["batch_stats"], jax.tree_util.tree_map(jnp.asarray, conv["batch_stats"]))
    out = tower.apply(
        {"params": conv["params"], "batch_stats": conv["batch_stats"]}, x)
    assert out.shape == (1, 20) and bool(jnp.all(jnp.isfinite(out)))


def test_apple_layout_converts_via_timm_layout():
    """Apple ml-mobileclip raw keys (rbr_* names, flat network.N list) remap
    onto the timm layout and then onto the tower tree."""
    from refining_clip_via_dinov2_representations_tpu.models.convert_external import (
        convert_mobileclip_s_image_state_dict,
    )

    timm_sd = _timm_fastvit_state_dict(TINY, output_dim=20)
    # reverse-map a timm dict into the Apple layout
    apple = {}
    stage_to_net = {}
    n = 0
    for s in range(4):
        if s > 0:
            stage_to_net[f"stages.{s}.downsample"] = f"network.{n}"; n += 1
        if TINY.pos_emb_stages[s]:
            stage_to_net[f"stages.{s}.pos_emb"] = f"network.{n}"; n += 1
        stage_to_net[f"stages.{s}.blocks"] = f"network.{n}"; n += 1
    for k, v in timm_sd.items():
        k = k[len("visual.trunk."):]
        for ours, net in stage_to_net.items():
            if k.startswith(ours):
                k = net + k[len(ours):]
                break
        k = (k.replace("stem.", "patch_embed.")
              .replace("conv_kxk", "rbr_conv").replace("conv_scale", "rbr_scale")
              .replace("identity", "rbr_skip").replace("final_conv.", "conv_exp.")
              .replace("large_conv", "lkb_origin").replace("mlp", "convffn")
              .replace("se.fc1", "se.reduce").replace("se.fc2", "se.expand")
              .replace("pos_enc", "pe").replace(".gamma", ""))
        if k == "head.fc.weight":
            apple["image_encoder.model.head.proj"] = v.T
            continue
        if k == "head.fc.bias":
            continue  # Apple proj has no bias
        apple["image_encoder.model." + k] = v

    back = convert_mobileclip_s_image_state_dict(apple)
    conv = convert_timm_fastvit_state_dict(back)
    tower = FastVitTower(cfg=TINY, output_dim=20)
    init_v = tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    import chex
    chex.assert_trees_all_equal_shapes(
        init_v["params"], jax.tree_util.tree_map(jnp.asarray, conv["params"]))


def test_mci_vit_shapes_and_converter():
    import chex

    m = MciVisionTransformer(width=32, layers=2, heads=2, output_dim=10,
                             image_size=32)
    x = jnp.zeros((2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 10)
    p = v["params"]
    # no_embed_class: pos embed over patch tokens only (32/16 grid -> 4)
    assert p["positional_embedding"].shape == (4, 32)
    assert p["class_embedding"].shape == (32,)

    # synthetic timm hybrid-vit state dict -> converter -> same tree
    t = "visual.trunk."
    sd = {}
    mid = 32 // 4
    for i, (ic, oc, k) in enumerate([(3, mid, 4), (mid, mid, 2), (mid, 32, 2)]):
        sd[f"{t}patch_embed.backbone.{i}.conv.weight"] = _torchlike((oc, ic, k, k))
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{t}patch_embed.backbone.{i}.bn.{leaf}"] = _torchlike((oc,))
    sd[t + "cls_token"] = _torchlike((1, 1, 32))
    sd[t + "pos_embed"] = _torchlike((1, 4, 32))
    for b in range(2):
        bp = f"{t}blocks.{b}"
        sd[f"{bp}.norm1.weight"] = _torchlike((32,)); sd[f"{bp}.norm1.bias"] = _torchlike((32,))
        sd[f"{bp}.attn.qkv.weight"] = _torchlike((96, 32)); sd[f"{bp}.attn.qkv.bias"] = _torchlike((96,))
        sd[f"{bp}.attn.proj.weight"] = _torchlike((32, 32)); sd[f"{bp}.attn.proj.bias"] = _torchlike((32,))
        sd[f"{bp}.norm2.weight"] = _torchlike((32,)); sd[f"{bp}.norm2.bias"] = _torchlike((32,))
        sd[f"{bp}.mlp.fc1.weight"] = _torchlike((128, 32)); sd[f"{bp}.mlp.fc1.bias"] = _torchlike((128,))
        sd[f"{bp}.mlp.fc2.weight"] = _torchlike((32, 128)); sd[f"{bp}.mlp.fc2.bias"] = _torchlike((32,))
    sd[t + "norm.weight"] = _torchlike((32,)); sd[t + "norm.bias"] = _torchlike((32,))
    sd[t + "head.weight"] = _torchlike((10, 32)); sd[t + "head.bias"] = _torchlike((10,))
    conv = convert_timm_mci_vit_state_dict(sd)
    chex.assert_trees_all_equal_shapes(
        v["params"], jax.tree_util.tree_map(jnp.asarray, conv["params"]))
    chex.assert_trees_all_equal_shapes(
        v["batch_stats"], jax.tree_util.tree_map(jnp.asarray, conv["batch_stats"]))


@pytest.mark.parametrize("name", ["MobileCLIP-S1", "MobileCLIP-S2", "MobileCLIP-B"])
def test_mobileclip_registry_configs_build(name):
    """The 3 formerly-raising registry names now build and trace."""
    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model, get_model_config, parse_model_cfg,
    )

    cfg = parse_model_cfg(get_model_config(name))
    model = build_model(cfg)
    img = cfg.vision_cfg.image_size
    # eval_shape: full trace without paying CPU conv FLOPs
    out = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, img, img, 3)),
            jnp.zeros((1, 77), jnp.int32),
        )
    )
    assert "params" in out


def test_full_tower_reparameterization():
    """fuse_fastvit_variables: the inference_mode tower with fused params
    reproduces the train tower's eval-mode outputs on random weights."""
    from refining_clip_via_dinov2_representations_tpu.models.fastvit import (
        fuse_fastvit_variables,
    )

    rng = np.random.default_rng(7)
    tower = FastVitTower(cfg=TINY, output_dim=12)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    v = tower.init(jax.random.PRNGKey(3), x)
    # randomize everything (positive variances)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) * 0.2, a.dtype), v["params"])
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) ** 2 + 0.3, a.dtype)
        if a.ndim else a, v["batch_stats"])
    v = {"params": params, "batch_stats": stats}
    ref = tower.apply(v, x)

    fused = fuse_fastvit_variables(v)
    inf_tower = FastVitTower(cfg=TINY, output_dim=12, inference_mode=True)
    # fused tree must match the inference tower's init structure
    import chex
    init_inf = inf_tower.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" not in init_inf  # no BN left
    chex.assert_trees_all_equal_shapes(
        init_inf["params"], jax.tree_util.tree_map(jnp.asarray, fused["params"]))
    out = inf_tower.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, fused["params"])}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    # and it is genuinely smaller
    n_train = sum(a.size for a in jax.tree_util.tree_leaves(v["params"]))
    n_inf = sum(a.size for a in jax.tree_util.tree_leaves(fused["params"]))
    assert n_inf < n_train
