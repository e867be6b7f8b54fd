"""PyTorch open_clip checkpoint → flax parameter-tree converter.

The embedding-fidelity bridge: takes a reference-format state dict (from
`torch.save`/safetensors, either the shared-namespace `CLIP` layout or the
`CustomTextCLIP`/CoCa layouts — `src/open_clip/model.py:293-788`) and emits
the nested parameter dict of our `models.clip.CLIP` flax module.

Layout rules (torch → flax):
  Linear `weight` [out, in]         → `kernel` [in, out]  (transpose)
  Conv2d `weight` OIHW              → `kernel` HWIO        (permute 2,3,1,0)
  LayerNorm `weight`/`bias`         → `scale`/`bias`
  MHA `in_proj_weight` [3D, D]      → `in_proj_kernel` [D, 3D]
  Embedding `weight`                → `embedding`
  bare projection Parameters (`visual.proj`, `text_projection`) copy as-is —
  the reference applies them as `x @ P` (`transformer.py:918`, `1223`).

Also handles the reference loader's checkpoint massaging
(`factory.py:218-277`): `module.`-prefix strip, logit_scale/bias squeeze to
scalar, position-embedding resize hooks live in `factory.py` here too.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional

import numpy as np


def _np(t) -> np.ndarray:
    """torch tensor / np array → fp32 numpy COPY.

    Must copy: `.numpy()` on a float32 CPU tensor shares memory with torch,
    and JAX's CPU backend can zero-copy numpy inputs — without the copy,
    converted params would silently track subsequent in-place torch updates
    (caught by tests/test_training_dynamics_parity.py)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.array(t, dtype=np.float32, copy=True)


def _set(tree: Dict[str, Any], path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def normalize_state_dict_keys(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Strip DDP/torch.compile prefixes (`factory.py:236-243` semantics)."""
    out = {}
    for k, v in state_dict.items():
        for prefix in ("module.", "_orig_mod."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        out[k] = v
    # position_ids buffers from HF towers are not parameters
    out.pop("text.transformer.embeddings.position_ids", None)
    return out


_LN_KEYS = {"weight": "scale", "bias": "bias"}


def _convert_block_leaf(parts, tensor, tree, prefix):
    """Convert one leaf inside a `resblocks_{i}`/`cross_attn_{i}` block."""
    # parts e.g. ['ln_1', 'weight'] or ['attn', 'in_proj_weight'] or
    # ['mlp', 'c_fc', 'weight'] or ['ls_1', 'gamma']
    if parts[0] in ("ln_1", "ln_2", "ln_1_kv", "ln_attn"):
        _set(tree, prefix + [parts[0], _LN_KEYS[parts[1]]], _np(tensor))
    elif parts[0] == "attn":
        sub = parts[1]
        if sub == "in_proj_weight":
            _set(tree, prefix + ["attn", "in_proj_kernel"], _np(tensor).T)
        elif sub == "in_proj_bias":
            _set(tree, prefix + ["attn", "in_proj_bias"], _np(tensor))
        elif sub == "out_proj":
            leaf = "kernel" if parts[2] == "weight" else "bias"
            val = _np(tensor).T if parts[2] == "weight" else _np(tensor)
            _set(tree, prefix + ["attn", "out_proj", leaf], val)
        else:
            raise KeyError(f"unhandled attn leaf {parts}")
    elif parts[0] == "mlp":
        layer = parts[1]  # c_fc / c_proj
        leaf = "kernel" if parts[2] == "weight" else "bias"
        val = _np(tensor).T if parts[2] == "weight" else _np(tensor)
        _set(tree, prefix + ["mlp", layer, leaf], val)
    elif parts[0] in ("ls_1", "ls_2"):
        _set(tree, prefix + [parts[0], "gamma"], _np(tensor))
    else:
        raise KeyError(f"unhandled block leaf {parts}")


def _convert_attn_pooler(parts, tensor, tree, prefix):
    """AttentionalPooler params (`transformer.py:194-216`): torch MHA with
    kdim/vdim keeps separate q/k/v projection weights."""
    if parts[0] == "query":
        _set(tree, prefix + ["query"], _np(tensor))
    elif parts[0] in ("ln_q", "ln_k"):
        _set(tree, prefix + [parts[0], _LN_KEYS[parts[1]]], _np(tensor))
    elif parts[0] == "attn":
        sub = parts[1]
        if sub in ("q_proj_weight", "k_proj_weight", "v_proj_weight"):
            _set(tree, prefix + [sub[0] + "_proj", "kernel"], _np(tensor).T)
        elif sub == "in_proj_bias":
            b = _np(tensor)
            d = b.shape[0] // 3
            _set(tree, prefix + ["q_proj", "bias"], b[:d])
            _set(tree, prefix + ["k_proj", "bias"], b[d : 2 * d])
            _set(tree, prefix + ["v_proj", "bias"], b[2 * d :])
        elif sub == "in_proj_weight":
            w = _np(tensor)
            d = w.shape[0] // 3
            _set(tree, prefix + ["q_proj", "kernel"], w[:d].T)
            _set(tree, prefix + ["k_proj", "kernel"], w[d : 2 * d].T)
            _set(tree, prefix + ["v_proj", "kernel"], w[2 * d :].T)
        elif sub == "out_proj":
            leaf = "kernel" if parts[2] == "weight" else "bias"
            val = _np(tensor).T if parts[2] == "weight" else _np(tensor)
            _set(tree, prefix + ["out_proj", leaf], val)
        else:
            raise KeyError(f"unhandled pooler leaf {parts}")
    else:
        raise KeyError(f"unhandled pooler leaf {parts}")


_RESNET_RE = re.compile(r"^layer([1-4])\.(\d+)\.(.+)$")
_BN_STATS = {"running_mean": "mean", "running_var": "var"}


def _convert_resnet_leaf(rest, tensor, params, batch_stats):
    """Map one `visual.*` ModifiedResNet leaf (reference
    `modified_resnet.py:96-200` layout) onto params/batch_stats trees."""
    def put_conv(prefix, leaf="kernel"):
        _set(params, ["visual", *prefix, leaf], _np(tensor).transpose(2, 3, 1, 0))

    def put_bn(prefix, leaf):
        if leaf in _BN_STATS:
            _set(batch_stats, ["visual", *prefix, _BN_STATS[leaf]], _np(tensor))
        elif leaf == "num_batches_tracked":
            pass
        else:
            _set(params, ["visual", *prefix, "scale" if leaf == "weight" else "bias"], _np(tensor))

    if rest[0] in ("conv1", "conv2", "conv3") and len(rest) == 2:
        put_conv([rest[0]])
    elif rest[0] in ("bn1", "bn2", "bn3") and len(rest) == 2:
        put_bn([rest[0]], rest[1])
    elif rest[0] == "attnpool":
        if rest[1] == "positional_embedding":
            _set(params, ["visual", "attnpool", "positional_embedding"], _np(tensor))
        else:  # q/k/v/c_proj Linear
            leaf = "kernel" if rest[2] == "weight" else "bias"
            val = _np(tensor).T if rest[2] == "weight" else _np(tensor)
            _set(params, ["visual", "attnpool", rest[1], leaf], val)
    else:
        m = _RESNET_RE.match(".".join(rest))
        if not m:
            raise KeyError(".".join(rest))
        stage, block, leaf_key = m.groups()
        prefix = [f"layer{stage}_{block}"]
        lp = leaf_key.split(".")
        if lp[0].startswith("conv"):
            put_conv(prefix + [lp[0]])
        elif lp[0].startswith("bn"):
            put_bn(prefix + [lp[0]], lp[1])
        elif lp[0] == "downsample":
            # Sequential("-1" avgpool, "0" conv, "1" bn) (`modified_resnet.py:36-41`)
            if lp[1] == "0":
                put_conv(prefix + ["downsample_conv"])
            else:
                put_bn(prefix + ["downsample_bn"], lp[2])
        else:
            raise KeyError(".".join(rest))


def _convert_hf_text_leaf(rest, tensor, params):
    """Map one `text.transformer.*` leaf of an HF-arch text tower
    (reference `HFTextEncoder.transformer`, an HF torch encoder) to the flax
    tower tree (`HFTextEncoder` scope: text/transformer/...).

    Same rules as transformers' own pt→flax converter for encoder archs
    (bert/roberta/xlm-roberta): Dense `weight`→`kernel`ᵀ, 1-D `weight`
    (LayerNorm)→`scale`, `*_embeddings.weight`→`embedding`."""
    arr = _np(tensor)
    *path, leaf = rest
    if leaf == "weight":
        parent = path[-1] if path else ""
        if arr.ndim == 1:
            leaf = "scale"
        elif parent.endswith("embeddings") or parent == "relative_attention_bias":
            leaf = "embedding"
        elif arr.ndim == 2:
            leaf, arr = "kernel", arr.T
        else:
            leaf, arr = "kernel", arr.transpose(2, 3, 1, 0)
    _set(params, ["text", "transformer", *path, leaf], arr)


def convert_clip_variables(state_dict: Mapping[str, Any], strict: bool = True) -> Dict[str, Any]:
    """Convert to a full flax variables dict {'params': ..., 'batch_stats'?}."""
    params, batch_stats = _convert(state_dict, strict)
    out: Dict[str, Any] = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def convert_clip_state_dict(state_dict: Mapping[str, Any], strict: bool = True) -> Dict[str, Any]:
    """Convert a reference state dict to our flax param tree (ViT/text towers;
    for ResNet towers use `convert_clip_variables` to also get batch_stats).

    Handles the shared-namespace `CLIP` layout (text keys at root,
    `model.py:313-322`), the `CustomTextCLIP` layout (`text.` prefix), and
    CoCa's extra `text_decoder.` keys.
    """
    params, _ = _convert(state_dict, strict)
    return params


def _convert(state_dict: Mapping[str, Any], strict: bool = True):
    sd = normalize_state_dict_keys(state_dict)
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    unhandled = []

    is_resnet = any(k.startswith("visual.layer1.") for k in sd)
    is_timm_trunk = any(k.startswith("visual.trunk.") for k in sd)
    # HF text tower (roberta/xlm-roberta/bert hub checkpoints, e.g.
    # laion/CLIP-ViT-B-32-roberta-base): HF encoder keys instead of
    # open_clip resblocks
    is_hf_text = any(k.startswith("text.transformer.embeddings.") for k in sd)
    if any(
        k.startswith(("text.transformer.shared.", "text.transformer.block."))
        for k in sd
    ):
        raise NotImplementedError(
            "t5/mt5 HF text towers use a different flax parameter layout; "
            "no hub checkpoints exist for them — convert via "
            "transformers.FlaxAutoModel if needed"
        )
    if is_timm_trunk:
        # hub checkpoint with a timm vision trunk + custom text tower;
        # sniff the trunk family from its keys
        if any(k.startswith("visual.trunk.stem.0.conv_kxk") for k in sd):
            from .fastvit import convert_timm_fastvit_state_dict

            vis = convert_timm_fastvit_state_dict(sd)
            params["visual"] = vis["params"]
            if vis.get("batch_stats"):
                batch_stats["visual"] = vis["batch_stats"]
        elif any(k.startswith("visual.trunk.patch_embed.backbone.stem.") for k in sd):
            # ViTamin: MUST be sniffed before the MCi branch below — its
            # "...backbone." prefix is a prefix of this one
            from .vitamin import convert_timm_vitamin_state_dict

            params["visual"] = convert_timm_vitamin_state_dict(sd)
        elif any(k.startswith("visual.trunk.patch_embed.backbone.") for k in sd):
            from .fastvit import convert_timm_mci_vit_state_dict

            vis = convert_timm_mci_vit_state_dict(sd)
            params["visual"] = vis["params"]
            if vis.get("batch_stats"):
                batch_stats["visual"] = vis["batch_stats"]
        elif any(".relative_position_bias_table" in k for k in sd):
            from .swin import convert_timm_swin_state_dict

            params["visual"] = convert_timm_swin_state_dict(sd)
        elif any(k.startswith("visual.trunk.stages.") for k in sd):
            from .convnext import convert_timm_convnext_state_dict

            params["visual"] = convert_timm_convnext_state_dict(sd)
        elif "visual.trunk.cls_token" in sd:
            # EVA family (timm `eva*`): EVA02 has SwiGLU MLPs / split q,k,v
            # projections / sub-LNs; EVA01 uses plain fused qkv + fc1/fc2
            is_eva02 = any(
                (".mlp.w1." in k) or (".mlp.w2." in k) or (".attn.q_proj." in k)
                or (".mlp.fc1_g." in k) or (".mlp.ffn_ln." in k) or (".attn.norm." in k)
                for k in sd
            )
            if is_eva02:
                from .eva02 import convert_timm_eva02_state_dict

                params["visual"] = convert_timm_eva02_state_dict(sd)
            else:
                from .eva import convert_timm_eva_state_dict

                params["visual"] = convert_timm_eva_state_dict(sd)
        else:
            from .siglip import convert_timm_siglip_vision_state_dict

            params["visual"] = convert_timm_siglip_vision_state_dict(sd)
        sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}

    block_re = re.compile(r"^(resblocks|cross_attn)\.(\d+)\.(.+)$")

    for key, tensor in sd.items():
        parts = key.split(".")
        try:
            if key in ("logit_scale", "logit_bias"):
                _set(params, [key], _np(tensor).reshape(()))  # scalar-ize (factory.py:245-261)
                continue

            # ---- route to tower ----
            if parts[0] == "visual":
                tower, rest = "visual", parts[1:]
            elif parts[0] in ("text", "text_decoder"):
                tower, rest = parts[0], parts[1:]
            else:
                tower, rest = "text", parts  # shared-namespace CLIP text keys

            rest_key = ".".join(rest)

            if tower == "visual":
                if is_resnet:
                    _convert_resnet_leaf(rest, tensor, params, batch_stats)
                elif rest[0] == "conv1":
                    _set(params, ["visual", "conv1", "kernel"], _np(tensor).transpose(2, 3, 1, 0))
                elif rest[0] in ("class_embedding", "positional_embedding", "proj"):
                    _set(params, ["visual", rest[0]], _np(tensor))
                elif rest[0] in ("ln_pre", "ln_post"):
                    _set(params, ["visual", rest[0], _LN_KEYS[rest[1]]], _np(tensor))
                elif rest[0] == "transformer":
                    m = block_re.match(".".join(rest[1:]))
                    if not m:
                        raise KeyError(key)
                    kind, idx, leaf = m.groups()
                    _convert_block_leaf(
                        leaf.split("."), tensor, params,
                        ["visual", "transformer", f"{kind}_{idx}" if kind != "resblocks" else f"resblocks_{idx}"],
                    )
                elif rest[0] in ("attn_pool", "attn_pool_contrastive"):
                    _convert_attn_pooler(rest[1:], tensor, params, ["visual", rest[0]])
                else:
                    raise KeyError(key)

            elif tower == "text":
                if rest[0] == "token_embedding":
                    _set(params, ["text", "token_embedding", "embedding"], _np(tensor))
                elif rest_key == "positional_embedding":
                    _set(params, ["text", "positional_embedding"], _np(tensor))
                elif rest_key == "cls_emb":
                    _set(params, ["text", "cls_emb"], _np(tensor))
                elif rest[0] == "ln_final":
                    _set(params, ["text", "ln_final", _LN_KEYS[rest[1]]], _np(tensor))
                elif rest_key == "text_projection":
                    _set(params, ["text", "text_projection"], _np(tensor))
                elif rest[0] == "text_projection":  # Linear variant (proj_bias)
                    leaf = "kernel" if rest[1] == "weight" else "bias"
                    val = _np(tensor).T if rest[1] == "weight" else _np(tensor)
                    _set(params, ["text", "text_projection", leaf], val)
                elif rest[0] == "transformer":
                    if is_hf_text:
                        _convert_hf_text_leaf(rest[1:], tensor, params)
                        continue
                    m = block_re.match(".".join(rest[1:]))
                    if not m:
                        raise KeyError(key)
                    kind, idx, leaf = m.groups()
                    _convert_block_leaf(
                        leaf.split("."), tensor, params,
                        ["text", "transformer", f"resblocks_{idx}"],
                    )
                elif rest[0] == "proj":
                    # HFTextEncoder projection head (`hf_model.py:145-151`):
                    # Linear -> proj; Sequential(Linear,GELU,Linear) -> 0/2
                    if rest[1] == "weight":
                        _set(params, ["text", "proj", "kernel"], _np(tensor).T)
                    elif rest[1] in ("0", "2") and rest[2] == "weight":
                        name = "proj_fc1" if rest[1] == "0" else "proj_fc2"
                        _set(params, ["text", name, "kernel"], _np(tensor).T)
                    else:
                        raise KeyError(key)
                elif rest[0] == "attn_mask":
                    continue  # buffer, not a parameter
                else:
                    raise KeyError(key)

            elif tower == "text_decoder":
                m = block_re.match(rest_key)
                if m:
                    kind, idx, leaf = m.groups()
                    name = f"resblocks_{idx}" if kind == "resblocks" else f"cross_attn_{idx}"
                    _convert_block_leaf(leaf.split("."), tensor, params, ["text_decoder", name])
                elif rest[0] == "ln_final":
                    _set(params, ["text_decoder", "ln_final", _LN_KEYS[rest[1]]], _np(tensor))
                elif rest_key == "text_projection":
                    _set(params, ["text_decoder", "text_projection"], _np(tensor))
                elif rest[0] == "attn_mask":
                    continue
                else:
                    raise KeyError(key)
        except KeyError:
            unhandled.append(key)

    if unhandled and strict:
        raise ValueError(f"unconverted checkpoint keys: {unhandled[:20]}{'...' if len(unhandled) > 20 else ''}")
    return params, batch_stats


def flax_params_to_torch_state_dict(
    params: Dict[str, Any],
    shared_text_namespace: bool = True,
    batch_stats: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Inverse conversion for checkpoint interoperability (save-side).

    Emits the shared-namespace `CLIP` layout by default so reference
    tooling (`factory.load_checkpoint`) can read our checkpoints. Covers
    the standard ViT tower and the ModifiedResNet tower (pass
    ``batch_stats`` so BN running statistics export too).
    """
    import torch

    sd: Dict[str, Any] = {}

    def t(x, transpose=False):
        arr = np.asarray(x)
        if transpose:
            arr = arr.T if arr.ndim == 2 else arr
        arr = np.ascontiguousarray(arr)
        if not arr.flags.writeable:  # torch.from_numpy rejects read-only views
            arr = arr.copy()
        return torch.from_numpy(arr)

    def emit_block(tree, torch_prefix):
        for ln in ("ln_1", "ln_2", "ln_1_kv"):
            if ln in tree:
                sd[f"{torch_prefix}.{ln}.weight"] = t(tree[ln]["scale"])
                sd[f"{torch_prefix}.{ln}.bias"] = t(tree[ln]["bias"])
        attn = tree["attn"]
        sd[f"{torch_prefix}.attn.in_proj_weight"] = t(attn["in_proj_kernel"], transpose=True)
        if "in_proj_bias" in attn:
            sd[f"{torch_prefix}.attn.in_proj_bias"] = t(attn["in_proj_bias"])
        sd[f"{torch_prefix}.attn.out_proj.weight"] = t(attn["out_proj"]["kernel"], transpose=True)
        sd[f"{torch_prefix}.attn.out_proj.bias"] = t(attn["out_proj"]["bias"])
        mlp = tree["mlp"]
        for lin in ("c_fc", "c_proj"):
            sd[f"{torch_prefix}.mlp.{lin}.weight"] = t(mlp[lin]["kernel"], transpose=True)
            sd[f"{torch_prefix}.mlp.{lin}.bias"] = t(mlp[lin]["bias"])
        for ls in ("ls_1", "ls_2"):
            if ls in tree:
                sd[f"{torch_prefix}.{ls}.gamma"] = t(tree[ls]["gamma"])

    def emit_resnet(visual, vstats):
        """ModifiedResNet (`modified_resnet.py:96-200` torch layout)."""
        def conv(tree, torch_name):
            sd[torch_name + ".weight"] = t(
                np.transpose(np.asarray(tree["kernel"]), (3, 2, 0, 1))
            )

        def bn(pname, storch, *, tree, stats):
            sd[storch + ".weight"] = t(tree["scale"])
            sd[storch + ".bias"] = t(tree["bias"])
            sd[storch + ".running_mean"] = t(stats["mean"])
            sd[storch + ".running_var"] = t(stats["var"])

        for i in ("1", "2", "3"):
            conv(visual[f"conv{i}"], f"visual.conv{i}")
            bn(f"bn{i}", f"visual.bn{i}", tree=visual[f"bn{i}"],
               stats=vstats[f"bn{i}"])
        for name in sorted(k for k in visual if k.startswith("layer")):
            stage, block = name[len("layer"):].split("_")
            tp = f"visual.layer{stage}.{block}"
            tree, stats = visual[name], vstats[name]
            for i in ("1", "2", "3"):
                conv(tree[f"conv{i}"], f"{tp}.conv{i}")
                bn(f"bn{i}", f"{tp}.bn{i}", tree=tree[f"bn{i}"],
                   stats=stats[f"bn{i}"])
            if "downsample_conv" in tree:
                # Sequential(-1 avgpool, 0 conv, 1 bn)
                conv(tree["downsample_conv"], f"{tp}.downsample.0")
                bn("downsample_bn", f"{tp}.downsample.1",
                   tree=tree["downsample_bn"], stats=stats["downsample_bn"])
        pool = visual["attnpool"]
        sd["visual.attnpool.positional_embedding"] = t(pool["positional_embedding"])
        for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
            sd[f"visual.attnpool.{proj}.weight"] = t(pool[proj]["kernel"], transpose=True)
            sd[f"visual.attnpool.{proj}.bias"] = t(pool[proj]["bias"])

    visual = params["visual"]
    is_resnet = "attnpool" in visual

    def _eva02_exporter(vis, stats):
        from .eva02 import eva02_params_to_timm_state_dict

        return eva02_params_to_timm_state_dict(vis)

    def _eva_exporter(vis, stats):
        from .eva import eva_params_to_timm_state_dict

        return eva_params_to_timm_state_dict(vis)

    def _siglip_exporter(vis, stats):
        from .siglip import siglip_vision_params_to_timm_state_dict

        return siglip_vision_params_to_timm_state_dict(vis)

    def _convnext_exporter(vis, stats):
        from .convnext import convnext_params_to_timm_state_dict

        return convnext_params_to_timm_state_dict(vis)

    def _fastvit_exporter(vis, stats):
        from .fastvit import fastvit_params_to_timm_state_dict

        if stats is None:
            raise ValueError(
                "FastViT torch export needs batch_stats (BN running statistics)"
            )
        return fastvit_params_to_timm_state_dict(vis, stats)

    def _mci_exporter(vis, stats):
        from .fastvit import mci_vit_params_to_timm_state_dict

        return mci_vit_params_to_timm_state_dict(vis, stats)

    def _vitamin_exporter(vis, stats):
        from .vitamin import vitamin_params_to_timm_state_dict

        return vitamin_params_to_timm_state_dict(vis)

    def _swin_exporter(vis, stats):
        from .swin import swin_params_to_timm_state_dict

        return swin_params_to_timm_state_dict(vis)

    def _is_eva02(vis):
        # EVA02: blocks at the tree top level with SwiGLU (fc1_g/fc1_x) or
        # plain (fc1/fc2) MLPs — distinguishes from ViTamin (w0/w1/w2 GeGLU)
        # and MCi-B/relpos (c_fc/c_proj) towers, also resblocks_* top-level
        return (
            "resblocks_0" in vis
            and isinstance(vis["resblocks_0"].get("mlp"), dict)
            and ("fc1_g" in vis["resblocks_0"]["mlp"] or "fc1" in vis["resblocks_0"]["mlp"])
        )

    # ordered (sniff, timm-layout exporter) table; every emitted trunk uses
    # the hub CustomTextCLIP layout, so the text tower gets the text.* prefix
    _TRUNK_EXPORTERS = (
        (lambda v: "patch_embedding" in v and "probe" in v, _siglip_exporter),
        (lambda v: "stem_conv" in v, _convnext_exporter),
        (_is_eva02, _eva02_exporter),
        # EVA01: standard ViT tree with a Dense (timm-head) projection
        (lambda v: "transformer" in v and isinstance(v.get("proj"), dict), _eva_exporter),
        (lambda v: "final_conv" in v and "stem_0" in v, _fastvit_exporter),
        (lambda v: "stem_0_conv" in v, _mci_exporter),
        (lambda v: "stem_conv1" in v, _vitamin_exporter),
        (lambda v: "patch_norm" in v, _swin_exporter),
    )

    emitted_trunk = False
    for sniff, exporter in _TRUNK_EXPORTERS:
        if sniff(visual):
            for k, v in exporter(visual, (batch_stats or {}).get("visual")).items():
                sd[k] = t(v)
            shared_text_namespace = False
            emitted_trunk = True
            break

    if emitted_trunk:
        pass
    elif is_resnet:
        vstats = (batch_stats or {}).get("visual")
        if vstats is None:
            raise ValueError(
                "ResNet torch export needs batch_stats (BN running statistics)"
            )
        emit_resnet(visual, vstats)
    elif "transformer" not in visual:
        raise NotImplementedError(
            "torch-layout export covers the standard CLIP ViT, ModifiedResNet "
            "and every timm-trunk tower with hub checkpoints (SigLIP, "
            "ConvNeXt, EVA01/02, FastViT/MCi, ViTamin, Swin); this tower "
            "(relpos/GAP ViT — no reference pretrained tags exist) has no "
            "timm-layout exporter"
        )
    if not is_resnet and not emitted_trunk:
        sd["visual.conv1.weight"] = t(np.transpose(np.asarray(visual["conv1"]["kernel"]), (3, 2, 0, 1)))
        sd["visual.class_embedding"] = t(visual["class_embedding"])
        sd["visual.positional_embedding"] = t(visual["positional_embedding"])
        if "ln_pre" in visual:
            sd["visual.ln_pre.weight"] = t(visual["ln_pre"]["scale"])
            sd["visual.ln_pre.bias"] = t(visual["ln_pre"]["bias"])
        for name, block in visual["transformer"].items():
            idx = name.split("_")[-1]
            emit_block(block, f"visual.transformer.resblocks.{idx}")
        sd["visual.ln_post.weight"] = t(visual["ln_post"]["scale"])
        sd["visual.ln_post.bias"] = t(visual["ln_post"]["bias"])
        if "proj" in visual:
            sd["visual.proj"] = t(visual["proj"])

        def emit_attn_pool(pool, torch_prefix):
            """Inverse of `_convert_attn_pooler` (CoCa attentional poolers)."""
            sd[f"{torch_prefix}.query"] = t(pool["query"])
            for ln in ("ln_q", "ln_k"):
                if ln in pool:
                    sd[f"{torch_prefix}.{ln}.weight"] = t(pool[ln]["scale"])
                    sd[f"{torch_prefix}.{ln}.bias"] = t(pool[ln]["bias"])
            # torch MHA fuses same-dim q/k/v into one in_proj_weight [3D, D]
            sd[f"{torch_prefix}.attn.in_proj_weight"] = t(
                np.concatenate([
                    np.asarray(pool[p]["kernel"]).T
                    for p in ("q_proj", "k_proj", "v_proj")
                ], axis=0)
            )
            sd[f"{torch_prefix}.attn.in_proj_bias"] = t(
                np.concatenate([
                    np.asarray(pool[p]["bias"]) for p in ("q_proj", "k_proj", "v_proj")
                ])
            )
            sd[f"{torch_prefix}.attn.out_proj.weight"] = t(
                pool["out_proj"]["kernel"], transpose=True
            )
            sd[f"{torch_prefix}.attn.out_proj.bias"] = t(pool["out_proj"]["bias"])

        for pool_name in ("attn_pool", "attn_pool_contrastive"):
            if pool_name in visual:
                emit_attn_pool(visual[pool_name], f"visual.{pool_name}")

    text = params["text"]
    if "token_embedding" not in text:
        # HF text tower (HFTextEncoder scope) — inverse of
        # `_convert_hf_text_leaf`; the reference stores these only as
        # CustomTextCLIP, so the `text.` prefix is unconditional
        def emit_hf_text(tree, prefix):
            for k, v in tree.items():
                if isinstance(v, dict):
                    emit_hf_text(v, f"{prefix}.{k}")
                elif k == "kernel":
                    arr = np.asarray(v)
                    sd[f"{prefix}.weight"] = t(
                        arr.T if arr.ndim == 2 else arr.transpose(3, 2, 0, 1)
                    )
                elif k in ("scale", "embedding"):
                    sd[f"{prefix}.weight"] = t(v)
                elif k == "bias":
                    sd[f"{prefix}.bias"] = t(v)
                else:
                    raise KeyError(f"unhandled hf text leaf {prefix}.{k}")

        emit_hf_text(text["transformer"], "text.transformer")
        if "proj" in text:
            sd["text.proj.weight"] = t(text["proj"]["kernel"], transpose=True)
        if "proj_fc1" in text:
            sd["text.proj.0.weight"] = t(text["proj_fc1"]["kernel"], transpose=True)
            sd["text.proj.2.weight"] = t(text["proj_fc2"]["kernel"], transpose=True)
    else:
        tp = "" if shared_text_namespace else "text."
        sd[f"{tp}token_embedding.weight"] = t(text["token_embedding"]["embedding"])
        sd[f"{tp}positional_embedding"] = t(text["positional_embedding"])
        for name, block in text["transformer"].items():
            idx = name.split("_")[-1]
            emit_block(block, f"{tp}transformer.resblocks.{idx}")
        sd[f"{tp}ln_final.weight"] = t(text["ln_final"]["scale"])
        sd[f"{tp}ln_final.bias"] = t(text["ln_final"]["bias"])
        proj = text["text_projection"]
        if isinstance(proj, dict):
            sd[f"{tp}text_projection.weight"] = t(proj["kernel"], transpose=True)
            if "bias" in proj:
                sd[f"{tp}text_projection.bias"] = t(proj["bias"])
        else:
            sd[f"{tp}text_projection"] = t(proj)

        if "cls_emb" in text:
            sd[f"{tp}cls_emb"] = t(text["cls_emb"])

    # CoCa multimodal decoder (`coca_model.py` text_decoder: interleaved
    # self/cross blocks, importer counterpart at `_convert` text_decoder arm)
    if "text_decoder" in params:
        dec = params["text_decoder"]
        for name, block in dec.items():
            if name.startswith(("resblocks_", "cross_attn_")):
                kind, idx = name.rsplit("_", 1)
                emit_block(block, f"text_decoder.{kind}.{idx}")
        sd["text_decoder.ln_final.weight"] = t(dec["ln_final"]["scale"])
        sd["text_decoder.ln_final.bias"] = t(dec["ln_final"]["bias"])
        sd["text_decoder.text_projection"] = t(dec["text_projection"])

    sd["logit_scale"] = t(params["logit_scale"])
    if "logit_bias" in params:
        sd["logit_bias"] = t(params["logit_bias"])
    return sd
