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
