#!/usr/bin/env python
"""Value-level oracle for the tower families that have no numeric oracle in
the zero-egress build environment (VERDICT r2 Weak #1): EVA01/EVA02, ViTamin,
FastViT/MCi (MobileCLIP), and the SigLIP-378 variants.

RUN THIS ON AN EGRESS-ENABLED MACHINE:

    pip install torch open_clip_torch timm
    python scripts/verify_against_timm.py                 # default family set
    python scripts/verify_against_timm.py --models EVA02-B-16:merged2b_s8b_b131k
    python scripts/verify_against_timm.py --quick          # smallest per family

For each (model, pretrained-tag) pair it:
  1. loads the torch reference implementation (open_clip_torch, which pulls
     the tower from timm) with the published checkpoint;
  2. loads the SAME checkpoint through THIS repo's
     `create_model_from_pretrained` (download → state-dict converter → flax);
  3. runs both on identical random pixels/token ids and reports the cosine
     between image features and between text features.

PASS criterion: cosine > 0.999 for both towers (fp32, CPU). Anything lower
means a converter key-mapping or architecture-detail bug — exactly the class
of silent error flagged in models/fastvit.py "ORACLE STATUS" (SE reduction
ratios, qkv-bias) and models/vitamin.py (GeGLU details).

Exit code: 0 = all pass, 1 = any failure, 2 = environment missing deps.
"""

from __future__ import annotations

import argparse
import sys

# smallest-checkpoint-first default set: one or two representatives per
# flagged family (tags from models/_pretrained_data.py)
DEFAULT_MODELS = [
    # EVA01 (models/eva.py — q/v-bias split, no ln_pre)
    ("EVA01-g-14", "laion400m_s11b_b41k"),
    # EVA02 (models/eva02.py — rope + SwiGLU + sub-LN)
    ("EVA02-B-16", "merged2b_s8b_b131k"),
    ("EVA02-L-14", "merged2b_s4b_b131k"),
    # ViTamin (models/vitamin.py — MBConv stages + GeGLU transformer)
    ("ViTamin-S", "datacomp1b"),
    ("ViTamin-B", "datacomp1b"),
    # MobileCLIP: FastViT image tower (S1/S2) and MCi hybrid ViT (B)
    # (models/fastvit.py — MobileOne reparam branches, SE ratios, qkv-bias)
    ("MobileCLIP-S1", "datacompdr"),
    ("MobileCLIP-B", "datacompdr"),
    # SigLIP 378/384 variants (models/siglip.py — MAP head, no-CLS ViT)
    ("ViT-SO400M-14-SigLIP-378", "webli"),
    ("ViT-B-16-SigLIP-384", "webli"),
]

QUICK_MODELS = [
    ("EVA02-B-16", "merged2b_s8b_b131k"),
    ("ViTamin-S", "datacomp1b"),
    ("MobileCLIP-S1", "datacompdr"),
    ("ViT-B-16-SigLIP-384", "webli"),
]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--models", nargs="*", default=None,
        help="model:tag pairs (default: representative set per flagged family)",
    )
    ap.add_argument("--quick", action="store_true",
                    help="one small model per family")
    ap.add_argument("--cos-min", type=float, default=0.999)
    ap.add_argument("--cache-dir", default=None)
    args = ap.parse_args(argv)

    try:
        import open_clip as torch_open_clip  # open_clip_torch
        import torch
    except ImportError as e:
        print(f"MISSING DEPS ({e}); pip install torch open_clip_torch timm",
              file=sys.stderr)
        return 2

    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from refining_clip_via_dinov2_representations_tpu.models import (
        create_model_from_pretrained,
        get_tokenizer,
    )

    if args.models:
        pairs = []
        for m in args.models:
            if ":" not in m:
                print(f"--models entry {m!r} must be model:pretrained_tag "
                      f"(e.g. EVA02-B-16:merged2b_s8b_b131k)", file=sys.stderr)
                return 2
            pairs.append(tuple(m.split(":", 1)))
    else:
        pairs = QUICK_MODELS if args.quick else DEFAULT_MODELS

    rng = np.random.default_rng(0)
    failures = []
    for name, tag in pairs:
        print(f"=== {name} ({tag}) ===", flush=True)
        try:
            tmodel, _, tpp = torch_open_clip.create_model_and_transforms(
                name, pretrained=tag, cache_dir=args.cache_dir
            )
            tmodel.eval()
            jmodel, jvars, jpp = create_model_from_pretrained(
                name, tag, cache_dir=args.cache_dir
            )

            size = tpp.transforms[0].size
            h = size if isinstance(size, int) else size[0]
            img = rng.normal(scale=0.5, size=(2, 3, h, h)).astype(np.float32)
            tok = get_tokenizer(name)
            texts = np.asarray(tok(["a photo of a cat", "a diagram of a dog"]))

            with torch.no_grad():
                t_img = tmodel.encode_image(torch.from_numpy(img)).numpy()
                t_txt = tmodel.encode_text(torch.from_numpy(texts.astype(np.int64))
                                           if texts.dtype != object else texts).numpy()
            j_img = np.asarray(
                jmodel.apply(jvars, jnp.asarray(img.transpose(0, 2, 3, 1)),
                             method="encode_image")
            )
            j_txt = np.asarray(
                jmodel.apply(jvars, jnp.asarray(texts), method="encode_text")
            )

            def cos(a, b):
                a = a / np.linalg.norm(a, axis=-1, keepdims=True)
                b = b / np.linalg.norm(b, axis=-1, keepdims=True)
                return float(np.min(np.sum(a * b, axis=-1)))

            ci, ct = cos(t_img, j_img), cos(t_txt, j_txt)
            ok = ci > args.cos_min and ct > args.cos_min
            print(f"  image cos {ci:.6f}  text cos {ct:.6f}  "
                  f"{'PASS' if ok else 'FAIL'}")
            if not ok:
                failures.append((name, tag, ci, ct))
        except Exception as e:  # keep sweeping; report at the end
            print(f"  ERROR: {e!r}")
            failures.append((name, tag, None, None))

    print()
    if failures:
        print("FAILURES:")
        for f in failures:
            print(f"  {f}")
        return 1
    print(f"ALL {len(pairs)} MODELS PASS (cosine > {args.cos_min})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
