"""Offline eval suite tests: pair stats parity vs reference helpers, kNN,
geometry, linear probe, zero-shot classifier."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refining_clip_via_dinov2_representations_tpu.eval import (
    anisotropy,
    knn_top1,
    linear_probe,
    pair_stats,
    save_feats,
    uniformity,
)
from tests.ref_loader import load_ref, reference_available


def _unit_feats(n, d, seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_pair_stats_matches_reference_helpers():
    torch = pytest.importorskip("torch")
    # load the reference helpers module under the synthetic train package;
    # mlflow import is guarded there so no stubbing needed
    helpers = load_ref_train_helpers()
    clip_z = _unit_feats(30, 8, 0)
    dino_z = _unit_feats(30, 12, 1)
    thresholds = [(0.90, 0.60), (0.85, 0.65), (0.80, 0.65)]

    ref = helpers._pair_stats(
        torch.from_numpy(clip_z), torch.from_numpy(dino_z), thresholds
    )
    ours = pair_stats(clip_z, dino_z, thresholds)

    assert ours["total_pairs"] == ref["total_pairs"]
    for key in ref["results"]:
        for field in ("count", "clip_high_count"):
            assert ours["results"][key][field] == ref["results"][key][field], (key, field)
        assert abs(
            ours["results"][key]["relative_percent"]
            - ref["results"][key]["relative_percent"]
        ) < 1e-6
    # top pairs agree on the leading entries
    for a, b in zip(ours["top_pairs"][:20], ref["top_pairs"][:20]):
        assert (a["i"], a["j"]) == (b["i"], b["j"])


def load_ref_train_helpers():
    import importlib

    from tests.ref_loader import _ensure_pkg

    _ensure_pkg()
    return importlib.import_module("ref_open_clip_train.helpers")


def test_knn_and_linear_probe_on_separable_data(tmp_path):
    """Two well-separated Gaussian classes: both evals should be ~100%."""
    rng = np.random.default_rng(0)
    n = 400
    centers = np.array([[2.0, 0.0, 0, 0], [-2.0, 0.0, 0, 0]], np.float32)
    labels = rng.integers(0, 2, n)
    feats = centers[labels] + 0.2 * rng.normal(size=(n, 4)).astype(np.float32)
    tr, va = tmp_path / "tr.npz", tmp_path / "va.npz"
    save_feats(str(tr), feats[: n // 2], labels[: n // 2])
    save_feats(str(va), feats[n // 2 :], labels[n // 2 :])

    assert knn_top1(str(tr), str(va), k=5) > 0.98
    assert linear_probe(str(tr), str(va), epochs=5, lr=0.5) > 0.98


def test_geometry_metrics():
    # perfectly uniform on a 2-sphere vs collapsed features
    uniform = _unit_feats(2000, 16, 0)
    collapsed = np.tile(_unit_feats(1, 16, 1), (2000, 1))
    assert uniformity(uniform) < uniformity(collapsed)
    pc1_u, _, _ = anisotropy(uniform)
    assert pc1_u < 0.2  # spread across dimensions


def test_zero_shot_classifier_shapes():
    from refining_clip_via_dinov2_representations_tpu.eval import (
        build_zero_shot_classifier,
    )
    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model,
        parse_model_cfg,
        register_model_config,
    )
    from refining_clip_via_dinov2_representations_tpu.tokenizer import SimpleTokenizer

    cfg_dict = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 16, "patch_size": 8, "width": 32, "layers": 2,
                       "head_width": 16},
        "text_cfg": {"context_length": 16, "vocab_size": 49408, "width": 32,
                     "heads": 4, "layers": 2},
    }
    model = build_model(parse_model_cfg(cfg_dict))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 16), jnp.int32)
    )
    tok = SimpleTokenizer(context_length=16)
    weights = build_zero_shot_classifier(
        model, variables, tok,
        classnames=["cat", "dog", "fish"],
        templates=["a photo of a {}.", "an image of a {}."],
        num_classes_per_batch=2,
    )
    assert weights.shape == (32, 3)
    norms = np.linalg.norm(np.asarray(weights), axis=0)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_clip_blinds_cli(tmp_path):
    """Standalone blind-pair CLI end-to-end on tiny data."""
    import pandas as pd
    from PIL import Image

    from refining_clip_via_dinov2_representations_tpu.eval.clip_blinds_cli import main
    from refining_clip_via_dinov2_representations_tpu.models import (
        register_model_config,
    )

    register_model_config("tiny-blind-model", {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 16, "patch_size": 8, "width": 32, "layers": 2,
                       "head_width": 16},
        "text_cfg": {"context_length": 12, "vocab_size": 49408, "width": 32,
                     "heads": 4, "layers": 2},
    })
    rng = np.random.default_rng(0)
    rows = []
    for i in range(6):
        p = tmp_path / f"b{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)).save(p)
        rows.append({"filepath": str(p)})
    csv = tmp_path / "imgs.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    dino = rng.normal(size=(6, 8)).astype(np.float32)
    np.save(tmp_path / "dino.npy", dino)

    stats = main([
        "--csv", str(csv), "--model", "tiny-blind-model",
        "--dino-feats", str(tmp_path / "dino.npy"),
        "--out-dir", str(tmp_path / "out"),
        "--batch-size", "4", "--clip-thr", "0.0", "--dino-thr", "1.0",
        "--save-pairs",
    ])
    assert (tmp_path / "out" / "summary.txt").exists()
    assert (tmp_path / "out" / "pairs.csv").exists()
    key = "clip≥0.0_dino≤1.0"
    # with trivial thresholds every pair is blind: 6C2 = 15
    assert stats["results"][key]["count"] == 15


def test_offline_cli_subcommands(tmp_path, capsys):
    """`python -m pkg.eval.offline <cmd>` — standalone per-tool CLI parity
    with the reference's test_scripts/ (each tool its own entry point)."""
    from refining_clip_via_dinov2_representations_tpu.eval.offline import main

    rng = np.random.default_rng(0)
    n = 200
    centers = np.array([[2.0, 0.0, 0, 0], [-2.0, 0.0, 0, 0]], np.float32)
    labels = rng.integers(0, 2, n)
    feats = centers[labels] + 0.2 * rng.normal(size=(n, 4)).astype(np.float32)
    tr, va = tmp_path / "tr.npz", tmp_path / "va.npz"
    save_feats(str(tr), feats[: n // 2], labels[: n // 2])
    save_feats(str(va), feats[n // 2 :], labels[n // 2 :])

    main(["knn", "--train", str(tr), "--val", str(va), "--k", "5"])
    out = capsys.readouterr().out
    assert "kNN top1=" in out and float(out.rsplit("=", 1)[1]) > 0.9

    main(["geometry", "--feats", str(va), "--n-pairs", "500"])
    out = capsys.readouterr().out
    assert "[uniformity]" in out and "[anisotropy]" in out

    main(["linear-probe", "--train", str(tr), "--val", str(va),
          "--epochs", "3", "--lr", "0.5"])
    out = capsys.readouterr().out
    assert "Linear probe best top1=" in out
