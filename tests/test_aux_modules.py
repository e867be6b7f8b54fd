"""Auxiliary module tests: openai inference, profiler, distributed helpers,
file utils, my_metrics, precision, utils."""

import json
import os

import numpy as np
import pytest

import jax


def test_openai_config_inference():
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_ref, reference_available

    if not reference_available():
        pytest.skip("reference not mounted")
    ref_model_mod = load_ref("model")
    torch.manual_seed(0)
    ref = ref_model_mod.CLIP(
        embed_dim=64,
        vision_cfg=ref_model_mod.CLIPVisionCfg(image_size=32, patch_size=8, width=48,
                                               layers=2, head_width=24),
        text_cfg=ref_model_mod.CLIPTextCfg(context_length=16, vocab_size=128,
                                           width=64, heads=4, layers=2),
    )
    from refining_clip_via_dinov2_representations_tpu.models.openai import (
        infer_openai_config,
    )

    cfg = infer_openai_config(ref.state_dict())
    assert cfg["embed_dim"] == 64
    assert cfg["quick_gelu"] is True
    assert cfg["vision_cfg"] == {"layers": 2, "width": 48, "patch_size": 8, "image_size": 32}
    assert cfg["text_cfg"]["context_length"] == 16
    assert cfg["text_cfg"]["layers"] == 2


def test_profiler_tiny():
    from refining_clip_via_dinov2_representations_tpu.models import register_model_config
    from refining_clip_via_dinov2_representations_tpu.train.profiler import profile_model

    register_model_config("tiny-prof", {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 16, "patch_size": 8, "width": 32, "layers": 2,
                       "head_width": 16},
        "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 4,
                     "layers": 2},
    })
    row = profile_model("tiny-prof")
    assert row["mparams"] > 0
    assert row["gflops"] is None or row["gflops"] >= 0


def test_world_info_from_env(monkeypatch):
    from refining_clip_via_dinov2_representations_tpu.train.distributed import (
        is_using_distributed,
        world_info_from_env,
    )

    monkeypatch.setenv("RANK", "3")
    monkeypatch.setenv("WORLD_SIZE", "8")
    monkeypatch.setenv("LOCAL_RANK", "1")
    local, rank, world = world_info_from_env()
    assert (local, rank, world) == (1, 3, 8)
    assert is_using_distributed()


def test_broadcast_object_single_host():
    from refining_clip_via_dinov2_representations_tpu.train.distributed import (
        broadcast_object,
        all_gather_object,
    )

    assert broadcast_object(None, {"a": 1}) == {"a": 1}
    assert all_gather_object(None, 7) == [7]


def test_file_utils_local(tmp_path):
    from refining_clip_via_dinov2_representations_tpu.train.file_utils import (
        check_exists,
        pt_load,
        remote_sync,
    )

    torch = pytest.importorskip("torch")
    p = tmp_path / "x.pt"
    torch.save({"v": 1}, p)
    assert check_exists(str(p))
    assert not check_exists(str(tmp_path / "nope.pt"))
    assert pt_load(str(p))["v"] == 1
    # fsspec local->local sync
    dst = tmp_path / "dst"
    ok = remote_sync(str(tmp_path), f"file://{dst}", "fsspec")
    if ok:  # fsspec present
        assert (dst / "x.pt").exists() or any(dst.rglob("x.pt"))


def test_flickr_retrieval_eval_matches_reference():
    torch = pytest.importorskip("torch")
    from tests.ref_loader import load_ref, reference_available

    if not reference_available():
        pytest.skip("reference not mounted")
    my_metrics_ref = load_ref("my_metrics")
    from refining_clip_via_dinov2_representations_tpu.eval.my_metrics import (
        flickr_retrieval_eval_,
    )

    rng = np.random.default_rng(0)
    n_img = 6
    txt = rng.normal(size=(n_img * 5, 8)).astype(np.float32)
    img = np.repeat(rng.normal(size=(n_img, 8)).astype(np.float32), 5, axis=0)
    ref = my_metrics_ref.flickr_retrieval_eval_(
        torch.from_numpy(txt), torch.from_numpy(img)
    )
    ours = flickr_retrieval_eval_(txt, img)
    for k in ref:
        assert abs(ref[k] - ours[k]) < 1e-4, (k, ref[k], ours[k])


def test_itm_plots(tmp_path):
    from refining_clip_via_dinov2_representations_tpu.eval.my_metrics import (
        extract_and_plot_itm_scores,
    )

    results = [
        {"epoch": e, "results": [{"val_name": "val", "metrics": {
            "text_to_image_R@1": 10.0 + e, "text_to_image_R@5": 30.0 + e,
            "text_to_image_R@10": 40.0 + e, "image_to_text_R@1": 12.0 + e,
            "image_to_text_R@5": 33.0 + e, "image_to_text_R@10": 44.0 + e,
            "average_similarity": 0.2 + 0.01 * e, "modality_gap": 0.8 - 0.01 * e,
        }}]}
        for e in range(1, 4)
    ]
    rf = tmp_path / "final_itm_results.json"
    rf.write_text(json.dumps(results))
    out = extract_and_plot_itm_scores(
        str(rf), str(tmp_path / "recall.png"), str(tmp_path / "sim.png"),
        save_csv_path=str(tmp_path / "itm.csv"),
    )
    assert (tmp_path / "recall.png").exists()
    assert (tmp_path / "itm.csv").exists()
    assert out["best_r_mean"][0] == 3  # monotone increasing → last epoch best


def test_precision_helpers():
    import jax.numpy as jnp

    from refining_clip_via_dinov2_representations_tpu.train.precision import (
        get_autocast,
        get_cast_dtype,
        get_input_dtype,
    )

    assert get_cast_dtype("bf16") == jnp.bfloat16
    assert get_cast_dtype("fp32") is None
    assert get_input_dtype("amp") == jnp.float32
    with get_autocast("amp")():
        pass  # null context


def test_utils():
    from refining_clip_via_dinov2_representations_tpu.utils import (
        feature_take_indices,
        get_2d_sincos_pos_embed,
        to_2tuple,
    )

    assert to_2tuple(3) == (3, 3)
    assert to_2tuple((1, 2)) == (1, 2)
    take, mx = feature_take_indices(12, 3)
    assert take == [9, 10, 11] and mx == 11
    take, mx = feature_take_indices(12, [-1, 0])
    assert take == [11, 0] and mx == 11
    pe = get_2d_sincos_pos_embed(16, 4, cls_token=True)
    assert pe.shape == (17, 16)
