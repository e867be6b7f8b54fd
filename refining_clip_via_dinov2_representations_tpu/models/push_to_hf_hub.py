"""HF-hub export/push (`src/open_clip/push_to_hf_hub.py`).

`save_for_hf` writes the reference-compatible artifact set — config JSON
(`open_clip_config.json`), weights in the torch layout
(`open_clip_pytorch_model.bin` / `.safetensors`), tokenizer files, and a
generated model card — so models trained here are loadable by either
implementation. `push_to_hf_hub` uploads the folder.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict
from pathlib import Path
from typing import Any, Dict, Optional

from ..constants import HF_CONFIG_NAME, HF_SAFE_WEIGHTS_NAME, HF_WEIGHTS_NAME
from ..transform import PreprocessCfg
from .convert import flax_params_to_torch_state_dict


def save_config_for_hf(model_cfg: Dict[str, Any], config_path: str,
                       preprocess_cfg: Optional[PreprocessCfg] = None):
    hf_config = {
        "model_cfg": model_cfg,
        "preprocess_cfg": asdict(preprocess_cfg or PreprocessCfg()),
    }
    with open(config_path, "w") as f:
        json.dump(hf_config, f, indent=2)


def save_for_hf(
    params: Dict[str, Any],
    model_cfg: Dict[str, Any],
    tokenizer,
    save_directory: str,
    preprocess_cfg: Optional[PreprocessCfg] = None,
    safe_serialization: bool = True,
    batch_stats: Optional[Dict[str, Any]] = None,
):
    """(`push_to_hf_hub.py:58-82`). Pass ``batch_stats`` for BN towers
    (ResNet/FastViT) so running statistics export too."""
    save_directory = Path(save_directory)
    save_directory.mkdir(exist_ok=True, parents=True)

    sd = flax_params_to_torch_state_dict(params, batch_stats=batch_stats)
    if safe_serialization:
        from safetensors.torch import save_file

        save_file(
            {k: v.contiguous() for k, v in sd.items()},
            str(save_directory / HF_SAFE_WEIGHTS_NAME),
        )
    else:
        import torch

        torch.save(sd, str(save_directory / HF_WEIGHTS_NAME))

    if tokenizer is not None and hasattr(tokenizer, "save_pretrained"):
        tokenizer.save_pretrained(str(save_directory))
    save_config_for_hf(
        model_cfg, str(save_directory / HF_CONFIG_NAME), preprocess_cfg
    )


def generate_readme(model_card: Dict[str, Any], model_name: str) -> str:
    """(`push_to_hf_hub.py:156-229`)"""
    tags = model_card.get("tags", ["clip"])
    lines = ["---", "tags:"]
    lines += [f"- {t}" for t in tags]
    lines += [
        "library_name: open_clip",
        "pipeline_tag: zero-shot-image-classification",
        f"license: {model_card.get('license', 'mit')}",
        "---",
        f"# Model card for {model_name}",
    ]
    if "description" in model_card:
        lines += ["", model_card["description"]]
    details = model_card.get("details", {})
    if details:
        lines += ["", "## Model Details"]
        for k, v in details.items():
            lines.append(f"- **{k}:** {v}")
    return "\n".join(lines) + "\n"


def push_to_hf_hub(
    params: Dict[str, Any],
    model_cfg: Dict[str, Any],
    tokenizer,
    repo_id: str,
    preprocess_cfg: Optional[PreprocessCfg] = None,
    commit_message: str = "Add model",
    token: Optional[str] = None,
    private: bool = False,
    model_card: Optional[Dict[str, Any]] = None,
    safe_serialization: bool = True,
    batch_stats: Optional[Dict[str, Any]] = None,
):
    """(`push_to_hf_hub.py:85-153`)"""
    import tempfile

    from huggingface_hub import HfApi

    api = HfApi(token=token)
    api.create_repo(repo_id, private=private, exist_ok=True)

    with tempfile.TemporaryDirectory() as tmpdir:
        save_for_hf(
            params, model_cfg, tokenizer, tmpdir,
            preprocess_cfg=preprocess_cfg, safe_serialization=safe_serialization,
            batch_stats=batch_stats,
        )
        model_card = model_card or {}
        model_name = repo_id.split("/")[-1]
        with open(os.path.join(tmpdir, "README.md"), "w") as f:
            f.write(generate_readme(model_card, model_name))
        return api.upload_folder(
            repo_id=repo_id, folder_path=tmpdir, commit_message=commit_message
        )


def push_pretrained_to_hf_hub(
    model_name: str,
    pretrained: str,
    repo_id: str,
    precision: str = "fp32",
    image_mean=None,
    image_std=None,
    image_interpolation: Optional[str] = None,
    image_resize_mode: Optional[str] = None,
    commit_message: str = "Add model",
    token: Optional[str] = None,
    private: bool = False,
    model_card: Optional[Dict[str, Any]] = None,
    **kwargs,
):
    """Load a registered pretrained tag and push it (`push_to_hf_hub.py:156-198`):
    create_model_from_pretrained -> tokenizer -> push_to_hf_hub."""
    from .factory import (
        create_model,
        get_model_config,
        get_tokenizer,
        merge_preprocess_kwargs,
    )

    force_pp = merge_preprocess_kwargs(
        PreprocessCfg(), mean=image_mean, std=image_std,
        interpolation=image_interpolation, resize_mode=image_resize_mode,
    )
    _model, variables, pp_cfg = create_model(
        model_name,
        pretrained=pretrained,
        precision=precision,
        force_preprocess_cfg=force_pp,
        require_pretrained=True,
        **kwargs,
    )
    model_card = model_card or {}
    model_card.setdefault("base_model", pretrained)
    return push_to_hf_hub(
        params=variables["params"],
        model_cfg=get_model_config(model_name),
        tokenizer=get_tokenizer(model_name),
        repo_id=repo_id,
        preprocess_cfg=pp_cfg,
        commit_message=commit_message,
        token=token,
        private=private,
        model_card=model_card,
        batch_stats=variables.get("batch_stats"),
    )
