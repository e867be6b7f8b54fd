"""Model FLOP/param profiler.

Rebuild of `src/open_clip_train/profiler.py` with XLA as the counter: per
tower and total FLOPs come from the compiled HLO cost analysis
(`jit(fn).lower(args).compile().cost_analysis()`) instead of
torch FlopCounterMode/fvcore. Results in MACs-equivalent GFLOPs (the
reference reports fvcore MACs; XLA counts FLOPs = 2xMACs, so we expose both).

CLI:
  python -m refining_clip_via_dinov2_representations_tpu.train.profiler \
      --model ViT-B-32 ViT-B-16 [--results-file out.csv]
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, Optional

import numpy as np


def _count_params(tree) -> int:
    import jax

    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(tree)))


def _flops(fn, *args) -> Optional[float]:
    import jax

    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns a list per device
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception:
        return None


def profile_model(model_name: str, batch_size: int = 1, force_cpu: bool = False) -> Dict:
    """FLOPs + params for one registered architecture
    (`profiler.py:128-205`)."""
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from ..models import build_model, get_model_config, parse_model_cfg
    from ..models.config import to_2tuple

    cfg = parse_model_cfg(get_model_config(model_name))
    model = build_model(cfg)
    ih, iw = to_2tuple(cfg.vision_cfg.image_size)
    image = jnp.zeros((batch_size, ih, iw, 3))
    text = jnp.zeros((batch_size, cfg.text_cfg.context_length), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), image, text)

    def fwd_image(v, im):
        return model.apply(v, im, method="encode_image")

    def fwd_text(v, tx):
        return model.apply(v, tx, method="encode_text")

    def fwd(v, im, tx):
        return model.apply(v, im, tx)

    image_flops = _flops(fwd_image, variables, image)
    text_flops = _flops(fwd_text, variables, text)
    total_flops = _flops(fwd, variables, image, text)

    params = variables["params"]
    image_params = _count_params(params.get("visual", {}))
    text_params = _count_params(params.get("text", {}))

    def gmacs(f):
        return round(f / 2 / 1e9, 2) if f else None

    return {
        "model": model_name,
        "image_size": ih,
        "image_width": cfg.vision_cfg.width,
        "text_width": cfg.text_cfg.width,
        "embed_dim": cfg.embed_dim,
        "mparams": round(_count_params(params) / 1e6, 2),
        "image_mparams": round(image_params / 1e6, 2),
        "text_mparams": round(text_params / 1e6, 2),
        "gflops": round(total_flops / 1e9, 2) if total_flops else None,
        "image_gflops": round(image_flops / 1e9, 2) if image_flops else None,
        "text_gflops": round(text_flops / 1e9, 2) if text_flops else None,
        "gmacs": gmacs(total_flops),
        "image_gmacs": gmacs(image_flops),
        "text_gmacs": gmacs(text_flops),
    }


def main(argv=None):
    parser = argparse.ArgumentParser("open_clip profiler (TPU)")
    parser.add_argument("--model", type=str, nargs="+", default=["ViT-B-32"])
    parser.add_argument("--results-file", type=str, default=None)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--force-cpu", action="store_true")
    args = parser.parse_args(argv)

    rows = []
    for name in args.model:
        if name == "all":
            from ..models import list_models

            names = list_models()
        else:
            names = [name]
        for n in names:
            try:
                row = profile_model(n, batch_size=args.batch_size, force_cpu=args.force_cpu)
                rows.append(row)
                print(json.dumps(row))
            except Exception as e:
                print(f"# {n}: failed ({e})")

    if args.results_file and rows:
        import csv

        with open(args.results_file, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
    return rows


if __name__ == "__main__":
    main()
