"""Model factory: the library's public entry points.

JAX counterpart of `src/open_clip/factory.py`: registry lookup with
`-quickgelu` suffix handling, precision policy, pretrained-checkpoint
loading through the torch→flax converter, position-embedding resize, and
the train/eval transform construction.

Because flax modules are stateless, `create_model*` returns
`(module, variables)` where `variables = {"params": ...}`; everything else
mirrors the reference call signatures.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import math
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD
from ..tokenizer import (
    DEFAULT_CONTEXT_LENGTH,
    HFTokenizer,
    SigLipTokenizer,
    SimpleTokenizer,
)
from ..transform import (
    AugmentationCfg,
    PreprocessCfg,
    image_transform_v2,
    merge_preprocess_dict,
    merge_preprocess_kwargs,
)
from .api_utils import set_model_preprocess_cfg
from .clip import build_model
from .config import get_model_config, list_models, parse_model_cfg, to_2tuple
from .convert import convert_clip_state_dict, normalize_state_dict_keys
from .pretrained import (
    HF_HUB_PREFIX,
    download_pretrained,
    download_pretrained_from_hf,
    get_pretrained_cfg,
    list_pretrained,
)

__all__ = [
    "create_model",
    "create_model_and_transforms",
    "create_model_from_pretrained",
    "get_tokenizer",
    "load_checkpoint",
    "list_models",
    "list_pretrained",
]


def _precision_to_dtype(precision: str):
    """Precision-flag → (compute dtype, param dtype). Reference precisions
    (`factory.py:420-443`, `precision.py:6-13`) collapse naturally on TPU:
    amp/GradScaler machinery is replaced by bf16 compute over fp32 params."""
    if precision in ("fp32", "amp", "float32"):
        return jnp.float32, jnp.float32
    if precision in ("bf16", "amp_bf16", "bfloat16"):
        return jnp.bfloat16, jnp.float32
    if precision == "pure_bf16":
        return jnp.bfloat16, jnp.bfloat16
    if precision in ("fp16", "amp_bfloat16", "pure_fp16"):
        # fp16 has no advantage on TPU; map to bf16 and note it
        logging.info("precision %s mapped to bf16 on TPU", precision)
        return jnp.bfloat16, jnp.float32
    raise ValueError(f"unknown precision {precision!r}")


def load_state_dict(checkpoint_path: str):
    """Load a torch-format checkpoint into numpy tensors
    (reference `factory.py:187-216` incl. safetensors + `module.` strip)."""
    path = str(checkpoint_path)
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        state_dict = load_file(path)
    elif path.endswith((".npz",)):
        state_dict = dict(np.load(path))
    else:
        import torch

        checkpoint = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(checkpoint, dict) and "state_dict" in checkpoint:
            state_dict = checkpoint["state_dict"]
        elif hasattr(checkpoint, "state_dict"):
            state_dict = checkpoint.state_dict()
            for key in ("input_resolution", "context_length", "vocab_size"):
                state_dict.pop(key, None)
        else:
            state_dict = checkpoint
    return normalize_state_dict_keys(state_dict)


def _interp_vision_pos_embed(pos: np.ndarray, target_len: int) -> np.ndarray:
    """Bicubic grid interpolation of the vision positional embedding
    (reference `model.py:957-1001`). CLS slot passes through."""
    if pos.shape[0] == target_len:
        return pos
    cls_tok, grid = pos[:1], pos[1:]
    old = int(math.sqrt(grid.shape[0]))
    new = int(math.sqrt(target_len - 1))
    assert old * old == grid.shape[0] and new * new == target_len - 1
    grid_2d = grid.reshape(old, old, -1)
    resized = jax.image.resize(
        jnp.asarray(grid_2d), (new, new, grid.shape[-1]), method="cubic"
    )
    return np.concatenate([cls_tok, np.asarray(resized).reshape(new * new, -1)], axis=0)


def _resize_text_pos_embed(pos: np.ndarray, target_len: int) -> np.ndarray:
    """Linear resize of text positional embedding (`model.py:1004-1037`)."""
    if pos.shape[0] == target_len:
        return pos
    if pos.shape[0] > target_len:
        return pos[:target_len]
    out = np.asarray(
        jax.image.resize(jnp.asarray(pos), (target_len, pos.shape[-1]), method="linear")
    )
    return out


def _merge_params(init_params, loaded, path=""):
    """Overlay loaded leaves onto the initialized tree, resizing pos-embeds."""
    merged = {}
    missing, unexpected = [], []
    for k, v in init_params.items():
        p = f"{path}/{k}" if path else k
        if k not in loaded:
            missing.append(p)
            merged[k] = v
            continue
        lv = loaded[k]
        if isinstance(v, dict):
            sub, m2, u2 = _merge_params(v, lv, p)
            merged[k] = sub
            missing += m2
            unexpected += u2
        else:
            arr = np.asarray(lv)
            if arr.shape != v.shape:
                if p == "visual/positional_embedding":
                    arr = _interp_vision_pos_embed(arr, v.shape[0])
                elif p == "text/positional_embedding":
                    arr = _resize_text_pos_embed(arr, v.shape[0])
                elif arr.size == v.size:
                    arr = arr.reshape(v.shape)
                else:
                    raise ValueError(f"shape mismatch at {p}: ckpt {arr.shape} vs model {v.shape}")
            merged[k] = jnp.asarray(arr, dtype=v.dtype)
    for k in loaded:
        if k not in init_params:
            unexpected.append(f"{path}/{k}" if path else k)
    return merged, missing, unexpected


def load_checkpoint(model, variables, checkpoint_path: str, strict: bool = True):
    """Load a checkpoint (torch reference format or ours) into `variables`
    (reference `factory.py:218-277`)."""
    from .convert import convert_clip_variables

    path = str(checkpoint_path)
    if os.path.isdir(path):
        # orbax `epoch_N` dir written by train/checkpoint.py:save_checkpoint —
        # lets serving/eval consume a mid-training checkpoint directly,
        # without waiting for the end-of-run torch-interop export. The
        # template-less restore is safe here: the tree is immediately merged
        # strictly against this model's own param structure.
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        if "params" not in restored:
            raise ValueError(f"{path} is a directory but not an orbax "
                             "checkpoint written by this trainer")
        # trainer layout: params = {"model": ..., "dino_head"?: ...}
        loaded_params = restored["params"].get("model", restored["params"])
        params, missing, unexpected = _merge_params(
            variables["params"], loaded_params
        )
        new_vars = dict(variables)
        new_vars["params"] = params
        if "batch_stats" in restored and "batch_stats" in variables:
            bs, bs_missing, bs_unexpected = _merge_params(
                variables["batch_stats"], restored["batch_stats"]
            )
            new_vars["batch_stats"] = bs
            missing += bs_missing
            unexpected += bs_unexpected
        if strict and (missing or unexpected):
            raise ValueError(
                f"checkpoint mismatch: missing={missing[:10]} "
                f"unexpected={unexpected[:10]}"
            )
        return new_vars, (missing, unexpected)
    if path.endswith(".npz"):
        import numpy as _np

        with _np.load(path) as _npz:
            keys = set(_npz.keys())
        if any(("txt/" in k) or ("img/" in k) for k in keys):
            # big_vision SigLIP layout (`convert.py:13-156`): already a flax
            # fragment keyed visual/text/logit_scale/logit_bias
            from .convert_external import load_big_vision_weights

            loaded = {"params": load_big_vision_weights(path)}
            params, missing, unexpected = _merge_params(
                variables["params"], loaded["params"]
            )
            if strict and (missing or unexpected):
                raise ValueError(
                    f"checkpoint mismatch: missing={missing[:10]} "
                    f"unexpected={unexpected[:10]}"
                )
            new_vars = dict(variables)
            new_vars["params"] = params
            return new_vars, (missing, unexpected)

    state_dict = load_state_dict(checkpoint_path)
    if any(k.startswith("image_encoder.model.") for k in state_dict):
        # Apple MobileCLIP raw layout (`convert.py:199-206`)
        from .convert_external import load_mobileclip_variables

        loaded = load_mobileclip_variables(state_dict)
    elif any(k.startswith(("visual.", "text.")) or k == "logit_scale" for k in state_dict):
        loaded = convert_clip_variables(state_dict, strict=strict)
    else:
        raise ValueError(f"unrecognized checkpoint layout in {checkpoint_path}")
    params, missing, unexpected = _merge_params(variables["params"], loaded["params"])
    new_vars = dict(variables)
    new_vars["params"] = params
    if "batch_stats" in loaded and "batch_stats" in variables:
        bs, bs_missing, bs_unexpected = _merge_params(
            variables["batch_stats"], loaded["batch_stats"]
        )
        new_vars["batch_stats"] = bs
        missing += bs_missing
        unexpected += bs_unexpected
    elif "batch_stats" in variables and "batch_stats" not in loaded:
        # BN tower but the checkpoint carries no running stats: surface the
        # model's stat leaves as missing so strict=True refuses to load a
        # model whose eval statistics would silently stay at init (mean 0 /
        # var 1) — torch load_state_dict(strict=True) errors the same way.
        missing += [
            "batch_stats/" + "/".join(str(k.key) for k in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(
                variables["batch_stats"]
            )[0]
        ]
    if strict and (missing or unexpected):
        raise ValueError(
            f"checkpoint mismatch: missing={missing[:10]} unexpected={unexpected[:10]}"
        )
    return new_vars, (missing, unexpected)


def load_hf_pretrained_text_params(
    variables, text_cfg, cache_dir: Optional[str] = None, text_scope: str = "text"
):
    """Overlay hub-pretrained HF encoder weights under
    `params[text_scope]['transformer']`.

    The reference loads them inside the tower constructor
    (`hf_model.py:121-127`); here module construction is weight-free, so
    `create_model` calls this after `model.init` whenever
    `text_cfg.hf_model_pretrained` is set and no full CLIP checkpoint
    supersedes it."""
    from .hf_model import ARCH_DICT, _instantiate_hf, resolve_hf_config

    config = resolve_hf_config(text_cfg.hf_model_name, cache_dir=cache_dir)
    pooler_type = text_cfg.hf_pooler_type or ARCH_DICT.get(
        config.model_type, {}
    ).get("pooler", "mean_pooler")
    hf_model = _instantiate_hf(
        text_cfg.hf_model_name, config, pooler_type, True, cache_dir
    )
    merged, missing, unexpected = _merge_params(
        variables["params"][text_scope]["transformer"],
        hf_model.params,
        path=f"{text_scope}/transformer",
    )
    if missing or unexpected:
        logging.warning(
            "hf pretrained overlay (%s): missing=%s unexpected=%s",
            text_cfg.hf_model_name, missing[:5], unexpected[:5],
        )
    params = dict(variables["params"])
    text = dict(params[text_scope])
    text["transformer"] = merged
    params[text_scope] = text
    new_vars = dict(variables)
    new_vars["params"] = params
    return new_vars


def create_model(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "fp32",
    force_quick_gelu: bool = False,
    force_custom_text: bool = False,  # flips the module's custom_text sidecar
    force_patch_dropout: Optional[float] = None,
    force_image_size: Optional[Union[int, Tuple[int, int]]] = None,
    force_preprocess_cfg: Optional[Dict[str, Any]] = None,
    cache_dir: Optional[str] = None,
    require_pretrained: bool = False,
    attn_impl: str = "auto",
    grad_checkpointing: bool = False,
    rng: Optional[jax.Array] = None,
    init_params: bool = True,
    **_unused,
):
    """Build a model (and optionally init/load params).

    Returns `(module, variables, preprocess_cfg)`. `variables` is None when
    `init_params=False` and no pretrained weights are given.
    """
    force_preprocess_cfg = force_preprocess_cfg or {}
    preprocess_cfg = PreprocessCfg()

    if model_name.startswith(HF_HUB_PREFIX):
        model_id = model_name[len(HF_HUB_PREFIX):]
        config_path = download_pretrained_from_hf(
            model_id, filename="open_clip_config.json", cache_dir=cache_dir
        )
        with open(config_path, "r", encoding="utf-8") as f:
            hub_cfg = json.load(f)
        raw_cfg = hub_cfg["model_cfg"]
        preprocess_cfg = PreprocessCfg(
            **merge_preprocess_dict(preprocess_cfg, hub_cfg.get("preprocess_cfg", {}))
        )
        checkpoint_path = download_pretrained_from_hf(model_id, cache_dir=cache_dir)
        pretrained = None
    else:
        # '/'→'-' only in the non-hub branch — hub repo ids keep their
        # org/repo slash (reference factory.py:368-372).
        model_name = model_name.replace("/", "-")
        raw_cfg = get_model_config(model_name)
        if raw_cfg is None:
            raise RuntimeError(
                f"Model config for {model_name} not found; available models: "
                f"{', '.join(list_models()[:20])}..."
            )
        checkpoint_path = None

    # '-quickgelu' naming convention (`factory.py:376-387`)
    if "quickgelu" in model_name.lower():
        raw_cfg["quick_gelu"] = True
    if force_quick_gelu:
        raw_cfg["quick_gelu"] = True
    if force_patch_dropout is not None:
        raw_cfg.setdefault("vision_cfg", {})["patch_dropout"] = force_patch_dropout
    if force_image_size is not None:
        raw_cfg.setdefault("vision_cfg", {})["image_size"] = force_image_size

    cfg = parse_model_cfg(raw_cfg)
    compute_dtype, param_dtype = _precision_to_dtype(precision)
    model = build_model(
        cfg, dtype=compute_dtype, attn_impl=attn_impl, remat=grad_checkpointing
    )
    if force_custom_text:
        # Same effect as the reference's force_custom_text (`factory.py:405`):
        # the one flax CLIP class serves both layouts, but lock/param-group
        # semantics downstream read this sidecar (set by build_model).
        object.__setattr__(model, "_custom_text", True)

    # resolve pretrained tag/path
    if pretrained:
        pcfg = get_pretrained_cfg(model_name, pretrained)
        if pcfg:
            checkpoint_path = download_pretrained(pcfg, cache_dir=cache_dir)
            preprocess_cfg = PreprocessCfg(**merge_preprocess_dict(preprocess_cfg, pcfg))
            if pcfg.get("quick_gelu") and not raw_cfg.get("quick_gelu"):
                logging.warning(
                    "%s tag %s expects QuickGELU but config uses GELU; pass the "
                    "-quickgelu model name (reference factory.py:452-463)",
                    model_name, pretrained,
                )
        elif os.path.exists(pretrained):
            checkpoint_path = pretrained
        else:
            raise RuntimeError(
                f"Pretrained weights ({pretrained}) not found for model {model_name}. "
                f"Available tags: {list_pretrained_tags(model_name)}"
            )
    if require_pretrained and not checkpoint_path:
        raise RuntimeError(f"no pretrained weights resolved for {model_name}")

    variables = None
    if init_params or checkpoint_path:
        ih, iw = to_2tuple(cfg.vision_cfg.image_size)
        cpu = jax.local_devices(backend="cpu")[0] if _has_cpu() else None
        with jax.default_device(cpu):
            # EVERYTHING — dummies, rng, the eager flax init — must be
            # created inside this block. Placement follows the inputs: a
            # dummy created outside (default device = the accelerator) drags
            # the whole UNJITTED init onto it op-by-op, which on a tunneled
            # TPU costs one RTT per op (~minutes for a ViT-B; found live in
            # round 5 as a 12-minute create_engine).
            dummy_img = jnp.zeros((1, ih, iw, 3), compute_dtype)
            dummy_txt = jnp.zeros((1, cfg.text_cfg.context_length), jnp.int32)
            init_rng = rng if rng is not None else jax.random.PRNGKey(0)
            if cpu is not None and rng is not None:
                # a caller-provided rng may live on the accelerator and
                # would drag the init there — rebuild it on the default
                # device via a host roundtrip. Do NOT device_put(rng, cpu):
                # an explicitly-committed input COMMITS the whole init
                # output tree to cpu:0, and a committed param tree later
                # fights pjit's context mesh ("incompatible devices: state
                # on [0], mesh [0..7]") in every multi-device train/eval.
                if jnp.issubdtype(init_rng.dtype, jax.dtypes.prng_key):
                    impl = jax.random.key_impl(init_rng)
                    init_rng = jax.random.wrap_key_data(
                        jnp.asarray(np.asarray(jax.random.key_data(init_rng))),
                        impl=impl,
                    )
                else:
                    init_rng = jnp.asarray(np.asarray(init_rng))
            variables = model.init(init_rng, dummy_img, dummy_txt)
        if checkpoint_path:
            variables, _ = load_checkpoint(model, variables, checkpoint_path)
        elif cfg.text_cfg.hf_model_name and cfg.text_cfg.hf_model_pretrained:
            try:
                variables = load_hf_pretrained_text_params(
                    variables, cfg.text_cfg, cache_dir=cache_dir
                )
            except OSError as e:
                raise RuntimeError(
                    f"pretrained HF text weights {cfg.text_cfg.hf_model_name!r} "
                    f"need hub-cached files (zero-egress environments must "
                    f"pre-download, or set hf_model_pretrained=false): {e}"
                ) from e
        if param_dtype != jnp.float32:
            variables = jax.tree.map(lambda x: x.astype(param_dtype), variables)

    preprocess_cfg = PreprocessCfg(
        **merge_preprocess_dict(preprocess_cfg, force_preprocess_cfg)
    )
    if force_image_size is not None:
        preprocess_cfg = PreprocessCfg(
            **merge_preprocess_dict(preprocess_cfg, {"size": force_image_size})
        )
    elif cfg.vision_cfg.image_size != preprocess_cfg.size:
        preprocess_cfg = PreprocessCfg(
            **merge_preprocess_dict(preprocess_cfg, {"size": cfg.vision_cfg.image_size})
        )
    # attach the resolved cfg so get_model_preprocess_cfg(model) answers like
    # the reference factory's set_model_preprocess_cfg call (`factory.py:394`)
    set_model_preprocess_cfg(model, dataclasses.asdict(preprocess_cfg))
    return model, variables, preprocess_cfg


def _has_cpu() -> bool:
    try:
        return bool(jax.local_devices(backend="cpu"))
    except RuntimeError:
        return False


def list_pretrained_tags(model_name: str):
    from .pretrained import list_pretrained_tags_by_model

    return list_pretrained_tags_by_model(model_name)


def create_model_and_transforms(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "fp32",
    image_mean: Optional[Tuple[float, ...]] = None,
    image_std: Optional[Tuple[float, ...]] = None,
    image_interpolation: Optional[str] = None,
    image_resize_mode: Optional[str] = None,
    aug_cfg: Optional[Union[Dict[str, Any], AugmentationCfg]] = None,
    **kwargs,
):
    """(`factory.py:591-652`) → (model, variables, preprocess_train, preprocess_val)."""
    force_preprocess_cfg = merge_preprocess_kwargs(
        PreprocessCfg(),
        mean=image_mean,
        std=image_std,
        interpolation=image_interpolation,
        resize_mode=image_resize_mode,
    )
    model, variables, pp_cfg = create_model(
        model_name,
        pretrained,
        precision=precision,
        force_preprocess_cfg=force_preprocess_cfg,
        **kwargs,
    )
    preprocess_train = image_transform_v2(pp_cfg, is_train=True, aug_cfg=aug_cfg)
    preprocess_val = image_transform_v2(pp_cfg, is_train=False)
    return model, variables, preprocess_train, preprocess_val


def create_model_from_pretrained(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "fp32",
    image_mean: Optional[Tuple[float, ...]] = None,
    image_std: Optional[Tuple[float, ...]] = None,
    image_interpolation: Optional[str] = None,
    image_resize_mode: Optional[str] = None,
    return_transform: bool = True,
    **kwargs,
):
    """(`factory.py:655-705`) → (model, variables[, preprocess_val])."""
    force_preprocess_cfg = merge_preprocess_kwargs(
        PreprocessCfg(),
        mean=image_mean,
        std=image_std,
        interpolation=image_interpolation,
        resize_mode=image_resize_mode,
    )
    model, variables, pp_cfg = create_model(
        model_name,
        pretrained,
        precision=precision,
        force_preprocess_cfg=force_preprocess_cfg,
        require_pretrained=True,
        **kwargs,
    )
    if not return_transform:
        return model, variables
    return model, variables, image_transform_v2(pp_cfg, is_train=False)


def get_tokenizer(
    model_name: str = "",
    context_length: Optional[int] = None,
    cache_dir: Optional[str] = None,
    **kwargs,
):
    """Tokenizer factory (`factory.py:124-184`)."""
    if model_name.startswith(HF_HUB_PREFIX):
        model_id = model_name[len(HF_HUB_PREFIX):]
        try:
            config_path = download_pretrained_from_hf(
                model_id, filename="open_clip_config.json", cache_dir=cache_dir
            )
            with open(config_path, "r", encoding="utf-8") as f:
                config = json.load(f)["model_cfg"]
        except Exception:
            return HFTokenizer(
                model_id,
                context_length=context_length or DEFAULT_CONTEXT_LENGTH,
                cache_dir=cache_dir,
                **kwargs,
            )
    else:
        config = get_model_config(model_name)
        assert config is not None, f"No valid model config found for {model_name}."

    text_config = config.get("text_cfg", {})
    tokenizer_kwargs = dict(text_config.get("tokenizer_kwargs", {}), **kwargs)
    if context_length is None:
        context_length = text_config.get("context_length", DEFAULT_CONTEXT_LENGTH)

    lname = model_name.lower()
    if text_config.get("hf_tokenizer_name"):
        return HFTokenizer(
            text_config["hf_tokenizer_name"],
            context_length=context_length,
            cache_dir=cache_dir,
            **tokenizer_kwargs,
        )
    if "siglip" in lname:
        tn = "gemma" if "siglip2" in lname else ("mc4" if "i18n" in lname else "c4-en")
        return SigLipTokenizer(tn, context_length=context_length)
    return SimpleTokenizer(context_length=context_length, **tokenizer_kwargs)
