"""Label-space alignment between independently extracted feature files
(r3 review finding: per-CSV class→index maps shift ids when the val split
is missing a train class)."""

import numpy as np

from refining_clip_via_dinov2_representations_tpu.eval.offline import (
    align_label_spaces,
    knn_top1,
    save_feats,
)


def test_align_label_spaces_shifted_ids():
    # train: cat=0 dog=1 zebra=2; val (no dog): cat=0 zebra=1
    ytr = np.array([0, 1, 2, 2])
    yva = np.array([0, 1, 1])
    a, b, union = align_label_spaces(ytr, ["cat", "dog", "zebra"], yva, ["cat", "zebra"])
    assert union == ["cat", "dog", "zebra"]
    np.testing.assert_array_equal(a, [0, 1, 2, 2])
    np.testing.assert_array_equal(b, [0, 2, 2])  # zebra is 2 in the union


def test_align_label_spaces_identity_and_missing():
    ytr = np.array([0, 1])
    yva = np.array([1, 0])
    a, b, union = align_label_spaces(ytr, ["a", "b"], yva, ["a", "b"])
    np.testing.assert_array_equal(a, ytr)
    np.testing.assert_array_equal(b, yva)
    # files without class lists pass through untouched (reference behavior)
    a, b, union = align_label_spaces(ytr, None, yva, ["a", "b"])
    assert union is None
    np.testing.assert_array_equal(a, ytr)


def test_knn_correct_across_shifted_label_spaces(tmp_path):
    """A val file missing one train class must still score 100% when the
    features are trivially separable — the old per-file id spaces scored it
    wrong."""
    rng = np.random.default_rng(0)
    # 3 classes on axes e0/e1/e2
    xtr = np.repeat(np.eye(3, 8, dtype=np.float32), 10, axis=0)
    xtr += 0.01 * rng.normal(size=xtr.shape).astype(np.float32)
    ytr = np.repeat(np.arange(3), 10)
    tr = tmp_path / "train.npz"
    save_feats(tr, xtr, ytr, classes=["cat", "dog", "zebra"])

    # val has only cat + zebra → local ids 0,1 but zebra must map to 2
    xva = np.concatenate([
        np.tile(np.eye(3, 8, dtype=np.float32)[0], (5, 1)),
        np.tile(np.eye(3, 8, dtype=np.float32)[2], (5, 1)),
    ])
    yva = np.array([0] * 5 + [1] * 5)
    va = tmp_path / "val.npz"
    save_feats(va, xva, yva, classes=["cat", "zebra"])

    acc = knn_top1(str(tr), str(va), k=3)
    assert acc == 1.0, acc
