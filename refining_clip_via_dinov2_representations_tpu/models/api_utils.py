"""Library-layer model utilities mirroring the reference's `open_clip.model`
helpers (reference `src/open_clip/model.py:791-838,938-954,1040-1077` and
`:148-163`): selective low-precision weight casting, shape-specialized model
tracing, and the preprocess/tokenize config accessors.

TPU-native shapes of each:

* ``convert_weights_to_lp`` is a PURE function over the flax param pytree
  (torch mutates `nn.Module` buffers in place; jax params are immutable).
  The selection rule reproduces the reference's layer classes by param
  structure: Linear/Conv kernels + their biases, fused attention
  projections, and the raw `proj`/`text_projection` matrices are cast;
  LayerNorm/BatchNorm scales+biases, embedding tables, positional/class
  embeddings, and `logit_scale`/`logit_bias` stay fp32 — exactly the set
  `model.py:794-826` casts.
* ``trace_model`` is the jax analog of `torch.jit.trace_module`
  (`model.py:938-954`): it AOT-lowers and compiles `forward`,
  `encode_image`, and `encode_text` at a fixed batch size, returning a
  `TracedModel` whose methods are shape-specialized compiled executables
  (like a torch trace, calling with a different shape is an error).
* ``get/set_model_preprocess_cfg`` / ``get_model_tokenize_cfg``
  (`model.py:1040-1077`): flax modules are frozen dataclasses, so the
  resolved preprocess config rides a sidecar attribute set via
  `object.__setattr__` (the factory attaches it, as the reference factory
  does at `factory.py:288,394`); the getters fall back to deriving from the
  module's own `vision_cfg`/`text_cfg` when no sidecar is present.
"""

from __future__ import annotations

import copy
from dataclasses import asdict
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "convert_weights_to_lp",
    "convert_weights_to_fp16",
    "get_cast_dtype",
    "get_input_dtype",
    "trace_model",
    "TracedModel",
    "get_model_preprocess_cfg",
    "set_model_preprocess_cfg",
    "get_model_tokenize_cfg",
]

_PP_SIDECAR = "_preprocess_cfg"


# ---------------------------------------------------------------------------
# precision helpers (`model.py:148-163`)
# ---------------------------------------------------------------------------

def get_cast_dtype(precision: str):
    """Weight/compute dtype for a precision flag (`model.py:148-155`).

    fp16 maps to bf16: the MXU has no fp16 advantage and bf16 needs no loss
    scaling (documented in COMPONENTS.md / train.precision).
    """
    if precision in ("bf16", "pure_bf16", "amp_bf16", "amp_bfloat16"):
        return jnp.bfloat16
    if precision in ("fp16", "pure_fp16"):
        return jnp.bfloat16
    return None


def get_input_dtype(precision: str):
    """Input-pixel dtype for a precision flag (`model.py:157-163`)."""
    if precision in ("bf16", "pure_bf16", "amp_bf16", "amp_bfloat16"):
        return jnp.bfloat16
    if precision in ("fp16", "pure_fp16"):
        return jnp.bfloat16
    return jnp.float32


# ---------------------------------------------------------------------------
# selective low-precision casting (`model.py:791-838`)
# ---------------------------------------------------------------------------

def _cast_decision(path, leaf, tree) -> bool:
    """Should this param leaf be cast? Mirrors `_convert_weights`'s layer
    classes (`model.py:794-826`) by param structure:

    * `kernel` (Dense/Conv weight) and a `bias` that has a sibling `kernel`
      → nn.Linear / nn.Conv1d/2d weights+biases;
    * `in_proj_kernel` / `in_proj_bias` → nn.MultiheadAttention projections;
    * 2-D raw `proj` / `text_projection` → the CLIP/VisionTransformer/
      TextTransformer nn.Parameter projections.

    LayerNorm/BatchNorm ({scale, bias} with no sibling kernel), embedding
    tables, positional/class embeddings, and logit_scale/bias fail every
    clause — the reference leaves all of those fp32 too.
    """
    name = path[-1]
    if name == "kernel":
        return True
    if name == "bias":
        return path[:-1] + ("kernel",) in tree
    if name in ("in_proj_kernel", "in_proj_bias"):
        return True
    if name in ("proj", "text_projection") and getattr(leaf, "ndim", 0) == 2:
        return True
    return False


def convert_weights_to_lp(tree, dtype=jnp.bfloat16):
    """Return a copy of `tree` with the applicable params cast to `dtype`
    (`model.py:791-829`). `tree` may be a full `variables` dict (only its
    `params` collection is touched — batch_stats etc. keep their dtypes) or
    a bare params pytree. Pure: the input is not mutated."""
    from flax import traverse_util

    is_variables = isinstance(tree, dict) and "params" in tree
    params = tree["params"] if is_variables else tree
    flat = traverse_util.flatten_dict(params)
    out = {
        path: leaf.astype(dtype) if _cast_decision(path, leaf, flat) else leaf
        for path, leaf in flat.items()
    }
    new_params = traverse_util.unflatten_dict(out)
    if not is_variables:
        return new_params
    new_tree = dict(tree)
    new_tree["params"] = new_params
    return new_tree


def convert_weights_to_fp16(tree, dtype=jnp.bfloat16):
    """Reference alias (`model.py:832`); on TPU "fp16" means bf16 — pass
    `dtype=jnp.float16` explicitly to force true fp16 storage."""
    return convert_weights_to_lp(tree, dtype=dtype)


# ---------------------------------------------------------------------------
# tracing (`model.py:938-954`)
# ---------------------------------------------------------------------------

class TracedModel:
    """Shape-specialized compiled CLIP (the jax analog of a torch trace).

    `forward(image, text)` / `encode_image(image)` / `encode_text(text)` are
    AOT-compiled executables fixed at the traced batch size and dtypes;
    calling with other shapes raises (as a torch trace would silently
    mis-run or error). `image_size` and `context_length` mirror the
    attributes the reference re-attaches after tracing (`model.py:953`).

    The weight pytree is a traced ARGUMENT of each executable, held on
    `self.variables` and passed at call time — never closure-captured, which
    would bake every weight into the HLO as literal constants (multi-GB
    programs for production towers; the same rule train/step.py follows for
    frozen teacher weights).
    """

    def __init__(self, variables, compiled_forward, compiled_image,
                 compiled_text, image_size, context_length, batch_size):
        self.variables = variables
        self._forward = compiled_forward
        self._encode_image = compiled_image
        self._encode_text = compiled_text
        self.image_size = image_size
        self.context_length = context_length
        self.batch_size = batch_size

    def forward(self, image, text):
        return self._forward(self.variables, image, text)

    def encode_image(self, image):
        return self._encode_image(self.variables, image)

    def encode_text(self, text):
        return self._encode_text(self.variables, text)

    def __call__(self, image, text):
        return self.forward(image, text)


def trace_model(model, variables, batch_size: int = 256, device=None,
                image_dtype=jnp.float32):
    """AOT-compile the model's three entry points at a fixed batch size
    (`model.py:938-954`). `variables` rides as a traced argument (device_put
    once, passed on every call) — pass the fp32 or
    `convert_weights_to_lp`-cast tree as desired. `image_dtype` fixes the
    pixel-input dtype the executables accept — pass
    `get_input_dtype(precision)` for a bf16 input pipeline."""
    from ..utils import to_2tuple

    ih, iw = to_2tuple(model.vision_cfg.image_size)
    ctx = model.text_cfg.context_length
    # materialize on device ONCE, unconditionally. device=None must resolve
    # to the default accelerator EXPLICITLY: device_put(tree, None) keeps
    # existing placement, and create_model deliberately inits on the CPU
    # backend — leaving those committed-to-CPU arrays in place would
    # re-transfer the whole weight tree on every call (or reject the inputs),
    # the exact regression trace_model exists to avoid
    variables = jax.device_put(
        variables, jax.devices()[0] if device is None else device
    )
    img_s = jax.ShapeDtypeStruct((batch_size, ih, iw, 3), image_dtype)
    txt_s = jax.ShapeDtypeStruct((batch_size, ctx), jnp.int32)
    vars_s = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        variables,
    )

    def forward(vars_, image, text):
        return model.apply(vars_, image, text)

    def encode_image(vars_, image):
        return model.apply(
            vars_, image, method=model.encode_image, normalize=False
        )

    def encode_text(vars_, text):
        return model.apply(
            vars_, text, method=model.encode_text, normalize=False
        )

    opts = {}
    if device is not None:
        opts["device"] = device
    compiled_forward = jax.jit(forward, **opts).lower(vars_s, img_s, txt_s).compile()
    compiled_image = jax.jit(encode_image, **opts).lower(vars_s, img_s).compile()
    compiled_text = jax.jit(encode_text, **opts).lower(vars_s, txt_s).compile()
    return TracedModel(
        variables, compiled_forward, compiled_image, compiled_text,
        image_size=(ih, iw), context_length=ctx, batch_size=batch_size,
    )


# ---------------------------------------------------------------------------
# preprocess / tokenize config accessors (`model.py:1040-1077`)
# ---------------------------------------------------------------------------

def set_model_preprocess_cfg(model, preprocess_cfg: Dict[str, Any]) -> None:
    """Attach the resolved preprocess config to the model
    (`model.py:1057-1065`). Flax modules are frozen dataclasses, so the dict
    rides a non-field sidecar attribute (invisible to tracing/params)."""
    object.__setattr__(model, _PP_SIDECAR, copy.deepcopy(dict(preprocess_cfg)))


def get_model_preprocess_cfg(model) -> Dict[str, Any]:
    """Resolved preprocess config for `model` (`model.py:1040-1054`): the
    factory-attached sidecar when present, else derived from the module's
    own `vision_cfg` + library defaults (the reference's legacy-attribute
    fallback)."""
    sidecar = getattr(model, _PP_SIDECAR, None)
    if sidecar:
        return copy.deepcopy(sidecar)
    from ..transform import PreprocessCfg

    vision_cfg = getattr(model, "vision_cfg", None)
    if vision_cfg is None:
        # the reference's legacy fallback reads `module.image_size` with no
        # default (`model.py:1044`) — a module with neither sidecar nor
        # vision cfg must error, not get a plausible-looking default
        raise AttributeError(
            "model has no attached preprocess cfg and no vision_cfg to "
            "derive one from (was it built outside the factory?)"
        )
    return asdict(PreprocessCfg(size=vision_cfg.image_size))


def get_model_tokenize_cfg(model) -> Dict[str, Any]:
    """Tokenizer-relevant config off the model (`model.py:1068-1077`)."""
    cfg: Dict[str, Any] = {}
    text_cfg = getattr(model, "text_cfg", None)
    if text_cfg is None:
        return cfg
    context_length = getattr(text_cfg, "context_length", None)
    if context_length is not None:
        cfg["context_length"] = context_length
    vocab_size = getattr(text_cfg, "vocab_size", None)
    if vocab_size is not None:
        cfg["vocab_size"] = vocab_size
    return cfg
