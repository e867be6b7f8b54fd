"""Evaluate-stack head-to-head parity (VERDICT r2 Weak #2 / Next #5).

Feed IDENTICAL synthetic embeddings through the torch reference's metric
stack (`src/open_clip_train/train.py:762-866`,
`src/open_clip/my_metrics.py:456-504`) and this repo's
`train/metrics.py` + `eval/my_metrics.py`; assert the numbers the thesis
reports — R@{1,5,10}, mean/median rank, positive cosine, modality gap — are
equal, converting "the formulas look the same" into proven equality.
"""

import numpy as np
import pytest

from tests.ref_loader import load_ref, load_ref_train, reference_available

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference source not present"
)


def _synthetic_embeddings(n_img=40, caps_per_img=5, dim=64, seed=0):
    """Correlated image/caption features: recalls land strictly between 0 and
    100 so every metric is exercised away from its degenerate values."""
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(n_img, dim)).astype(np.float32)
    cap2img = np.repeat(np.arange(n_img), caps_per_img)
    txt = img[cap2img] + 2.5 * rng.normal(size=(len(cap2img), dim)).astype(np.float32)
    return img, txt.astype(np.float32), cap2img


def test_clip_retrieval_metrics_head_to_head():
    from refining_clip_via_dinov2_representations_tpu.train.metrics import (
        clip_retrieval_metrics,
    )

    ref_train = load_ref_train("train")
    img, txt, cap2img = _synthetic_embeddings()

    ours = clip_retrieval_metrics(img, txt, cap2img)
    theirs = ref_train.clip_retrieval_metrics(
        torch.from_numpy(img), torch.from_numpy(txt), torch.from_numpy(cap2img)
    )

    assert set(ours) == set(theirs)
    for k in theirs:
        assert ours[k] == pytest.approx(theirs[k], abs=1e-4), k
    # sanity: the test actually exercises mid-range recalls
    assert 0.0 < ours["text_to_image_R@1"] < 100.0


def test_get_clip_metrics_head_to_head():
    from refining_clip_via_dinov2_representations_tpu.train.metrics import (
        get_clip_metrics,
    )

    ref_train = load_ref_train("train")
    rng = np.random.default_rng(3)
    n, d = 32, 48
    img = rng.normal(size=(n, d)).astype(np.float32)
    txt = (img + 0.8 * rng.normal(size=(n, d))).astype(np.float32)
    scale = 42.7

    ours = get_clip_metrics(img, txt, scale)
    theirs = ref_train.get_clip_metrics(
        torch.from_numpy(img), torch.from_numpy(txt), torch.tensor(scale)
    )
    assert set(ours) == set(theirs)
    for k in theirs:
        assert float(ours[k]) == pytest.approx(float(theirs[k]), abs=1e-4), k


def test_pair_stats_head_to_head():
    """CLIP-blind pair statistics — THE thesis metric (`helpers.py:221-285`):
    identical L2-normalized embeddings through both stacks must give equal
    counts / percent / relative_percent per threshold and the same ranked
    top-gap pairs."""
    from refining_clip_via_dinov2_representations_tpu.eval.clip_blind import (
        pair_stats,
    )

    ref_helpers = load_ref_train("helpers")
    rng = np.random.default_rng(11)
    n, d = 60, 32
    clip_z = rng.normal(size=(n, d)).astype(np.float32)
    # correlate DINO with CLIP so threshold masks are non-degenerate
    dino_z = (clip_z + 1.5 * rng.normal(size=(n, d))).astype(np.float32)
    clip_z /= np.linalg.norm(clip_z, axis=1, keepdims=True)
    dino_z /= np.linalg.norm(dino_z, axis=1, keepdims=True)
    # the reference's in-training thresholds (main.py:1103-1104) plus
    # quantile-derived ones guaranteeing mid-range counts on random data.
    # Cutoffs are taken as MIDPOINTS between adjacent data values so no pair
    # similarity sits within float32-matmul ULP error of a threshold —
    # otherwise NumPy-vs-torch BLAS differences could flip a count by 1.
    iu, ju = np.triu_indices(n, k=1)
    cs_u = (clip_z @ clip_z.T)[iu, ju]
    ds_u = (dino_z @ dino_z.T)[iu, ju]

    def _mid_quantile(vals, q):
        s = np.sort(vals)
        k = min(int(q * (len(s) - 1)), len(s) - 2)
        return float((s[k] + s[k + 1]) / 2)

    thresholds = [
        (0.90, 0.60), (0.85, 0.65), (0.80, 0.65),
        (_mid_quantile(cs_u, 0.7), _mid_quantile(ds_u, 0.6)),
        (_mid_quantile(cs_u, 0.5), _mid_quantile(ds_u, 0.8)),
    ]

    ours = pair_stats(clip_z, dino_z, thresholds=thresholds)
    theirs = ref_helpers._pair_stats(
        torch.from_numpy(clip_z), torch.from_numpy(dino_z), thresholds
    )

    assert ours["total_pairs"] == theirs["total_pairs"]
    assert set(ours["results"]) == set(theirs["results"])
    exercised = 0
    for key, ref_r in theirs["results"].items():
        r = ours["results"][key]
        assert r["count"] == ref_r["count"], key
        assert r["clip_high_count"] == ref_r["clip_high_count"], key
        assert r["percent"] == pytest.approx(ref_r["percent"], abs=1e-4), key
        assert r["relative_percent"] == pytest.approx(
            ref_r["relative_percent"], abs=1e-4
        ), key
        exercised += int(0 < ref_r["count"] < ours["total_pairs"])
    assert exercised >= 2, "thresholds failed to exercise mid-range counts"

    # top-gap ranking: compared as a set keyed by (i, j) — NumPy-vs-torch BLAS
    # ULP differences can swap near-equal gaps, so exact order is not portable.
    # Pairs present on only one side must sit at the rank-200 gap boundary.
    assert len(ours["top_pairs"]) == len(theirs["top_pairs"]) == 200
    ours_by_ij = {(p["i"], p["j"]): p for p in ours["top_pairs"]}
    theirs_by_ij = {(p["i"], p["j"]): p for p in theirs["top_pairs"]}
    boundary_gap = min(p["gap"] for p in theirs["top_pairs"])
    for ij in set(ours_by_ij) ^ set(theirs_by_ij):
        p = ours_by_ij.get(ij) or theirs_by_ij[ij]
        assert p["gap"] == pytest.approx(boundary_gap, abs=1e-5), ij
    common = set(ours_by_ij) & set(theirs_by_ij)
    assert len(common) >= 195  # near-total agreement away from the boundary
    for ij in common:
        for f in ("clip_sim", "dino_sim", "gap"):
            assert ours_by_ij[ij][f] == pytest.approx(theirs_by_ij[ij][f], abs=1e-5)


def test_clip_blind_alignment_head_to_head():
    """Path-map building, first-occurrence dedup, and path-first/basename-
    fallback DINO alignment (`helpers.py:148-219`) on identical inputs."""
    from refining_clip_via_dinov2_representations_tpu.eval.clip_blind import (
        align_dino_feats_to_paths,
        build_dino_path_maps,
        dedup_by_path,
    )
    from refining_clip_via_dinov2_representations_tpu.train.data import (
        _canon_path,
    )

    ref_helpers = load_ref_train("helpers")
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(8, 16)).astype(np.float32)

    # all three accepted index-map shapes
    raw_maps = [
        {"/data/a.JPG": 0, "/data/b.jpg": 1, "ignored": "not-an-int"},
        {"path_to_index": {"/data/a.JPG": 0, "/data/sub/c.jpg": 2}},
        {
            "path_to_index": {"/data/a.JPG": 0},
            "basename_to_index": {"d.jpg": 3, "/x/e.jpg": 4},
        },
    ]
    for raw in raw_maps:
        ours_p, ours_b = build_dino_path_maps(raw)
        ref_p, ref_b = ref_helpers._build_dino_path_maps(raw)
        assert ours_p == ref_p and ours_b == ref_b, raw

    # dedup: duplicates interleaved, first occurrence kept
    paths = ["/d/x.jpg", "/d/y.jpg", "/d/x.jpg", "/d/z.jpg", "/d/y.jpg"]
    clip_z = rng.normal(size=(5, 16)).astype(np.float32)
    z_u, p_u, keep = dedup_by_path(clip_z, paths)
    rz, rp, rkeep = ref_helpers._dedup_by_path(torch.from_numpy(clip_z), paths)
    assert p_u == rp and list(keep) == list(rkeep)
    np.testing.assert_allclose(z_u, rz.numpy())

    # alignment: exact-path hit, basename fallback, miss — same counters,
    # same kept rows, same normalized features
    query = [
        _canon_path("/data/a.JPG"),      # path hit
        "/elsewhere/d.jpg",              # basename-only hit
        "/missing/q.jpg",                # miss
        _canon_path("/data/sub/c.jpg"),  # path hit
    ]
    path2idx, base2idx = build_dino_path_maps(
        {
            "path_to_index": {"/data/a.JPG": 0, "/data/sub/c.jpg": 2},
            "basename_to_index": {"d.jpg": 3},
        }
    )
    ours = align_dino_feats_to_paths(feats, path2idx, base2idx, query)
    theirs = ref_helpers._align_dino_feats_to_paths(
        torch.from_numpy(feats), path2idx, base2idx, query
    )
    assert ours[1:] == (theirs[1], theirs[2], theirs[3], theirs[4])
    np.testing.assert_allclose(ours[0], theirs[0].numpy(), atol=1e-6)


def test_retrieval_score_selection_head_to_head():
    """Best-epoch selection (`helpers.py:395-458`): recall extraction /
    normalization, per-dataset score+tie, and the epoch aggregate must match
    the reference on mixed fraction/percent inputs and missing-recall rows."""
    from refining_clip_via_dinov2_representations_tpu.train.helpers import (
        dataset_retrieval_score,
        epoch_retrieval_score,
        extract_recalls_0_100,
    )

    ref_helpers = load_ref_train("helpers")
    # mixed shapes the reference tolerates: fractions, percents, hyphenated
    # keys, non-recall keys, a dataset with no recalls at all
    m1 = {
        "text_to_image_R@1": 0.314, "text_to_image_R@5": 0.62,
        "text_to_image_R@10": 0.74, "image_to_text_R@1": 41.0,
        "image_to_text_R@5": 68.0, "image_to_text_R@10": 79.0,
        "mean_rank": 7.2, "clip_val_loss": 1.3,
    }
    m2 = {"image-to-text-R@1": 0.5, "text-to-image-R@5": 55.0, "epoch": 3}
    m3 = {"loss": 2.0}

    for m in (m1, m2, m3):
        assert extract_recalls_0_100(m) == ref_helpers._extract_recalls_0_100(m)
        s, t = dataset_retrieval_score(m)
        rs, rt = ref_helpers._dataset_retrieval_score(m)
        assert (s != s) == (rs != rs)  # NaN-ness matches
        if s == s:
            assert s == pytest.approx(rs) and t == pytest.approx(rt)

    epoch_results = [
        {"val_name": "flickr30k-val", "metrics": m1},
        {"val_name": "mscoco-val", "metrics": m2},
        {"val_name": "val", "metrics": m3},
    ]
    ours = epoch_retrieval_score(epoch_results)
    theirs = ref_helpers._epoch_retrieval_score(epoch_results)
    assert ours[0] == pytest.approx(theirs[0])
    assert ours[1] == pytest.approx(theirs[1])


def test_flickr_retrieval_eval_head_to_head():
    from refining_clip_via_dinov2_representations_tpu.eval.my_metrics import (
        flickr_retrieval_eval_,
    )

    ref_mm = load_ref("my_metrics")
    img, txt, cap2img = _synthetic_embeddings(n_img=24, seed=7)
    # reference layout: caption-level rows, image features repeated per caption
    img_rows = img[cap2img]

    ours = flickr_retrieval_eval_(txt, img_rows)
    theirs = ref_mm.flickr_retrieval_eval_(
        torch.from_numpy(txt), torch.from_numpy(img_rows)
    )
    assert set(ours) == set(theirs)
    for k in theirs:
        assert float(ours[k]) == pytest.approx(float(theirs[k]), abs=1e-4), k
    assert 0.0 < ours["txt_r1"] < 100.0
