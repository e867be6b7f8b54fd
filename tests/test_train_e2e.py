"""End-to-end harness tests: CLI on synthetic data, CSV/webdataset pipelines,
metrics, checkpoint save/resume."""

import io
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

import jax

from refining_clip_via_dinov2_representations_tpu.models import register_model_config
from refining_clip_via_dinov2_representations_tpu.train.metrics import (
    build_unique_image_features,
    clip_retrieval_metrics,
)

TINY_CFG = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 16, "patch_size": 8, "width": 32, "layers": 2, "head_width": 16},
    "text_cfg": {"context_length": 12, "vocab_size": 49408, "width": 32, "heads": 4, "layers": 2},
}
register_model_config("tiny-e2e-model", TINY_CFG)


def test_cli_synthetic_training(tmp_path):
    """Full main(): synthetic data, 1 epoch, checkpoint written, artifacts."""
    from refining_clip_via_dinov2_representations_tpu.train.main import main

    best = main([
        "--model", "tiny-e2e-model",
        "--dataset-type", "synthetic",
        "--train-num-samples", "32",
        "--batch-size", "2",  # per-device; global = 2 x 8 virtual devices = 16
        "--epochs", "1",
        "--warmup", "2",
        "--lr", "1e-3",
        "--precision", "fp32",
        "--logs", str(tmp_path),
        "--name", "smoke",
        "--log-every-n-steps", "1",
        "--workers", "2",
        "--async-checkpoint",
        "--compile-cache", str(tmp_path / "xla_cache"),
    ])
    base = tmp_path / "smoke"
    assert (base / "checkpoints" / "epoch_1").exists()
    assert (base / "loss_steps.json").exists()
    assert (base / "params.txt").exists()
    steps = json.loads((base / "loss_steps.json").read_text())
    assert len(steps) >= 1 and np.isfinite(steps[-1]["total_loss"])
    # --compile-cache: the train-step compile (>1 s) must have persisted.
    # This holds regardless of whether earlier suite tests already compiled
    # (jax binds the cache at first compile; main() must reset_cache() on
    # rebind — ADVICE r4 medium).
    assert any((tmp_path / "xla_cache").iterdir())
    # ... and main() must have RESTORED the EFFECTIVE cache binding on exit,
    # not just the config value: suite compiles after main() must land in
    # the conftest cache dir, not keep writing into the run's dir. Assert
    # on the cache object jax would actually use for the next compile.
    import jax
    from jax._src import compilation_cache as _cc

    assert jax.config.jax_compilation_cache_dir != str(tmp_path / "xla_cache")
    effective = _cc._get_cache(jax.devices()[0].client)
    assert effective is not None
    assert os.path.realpath(effective.path) != os.path.realpath(
        tmp_path / "xla_cache"
    )
    assert os.path.realpath(effective.path) == os.path.realpath(
        jax.config.jax_compilation_cache_dir
    )


def test_cli_dino_synthetic_training(tmp_path):
    """DINO loss path end-to-end on synthetic data with random teacher feats."""
    from refining_clip_via_dinov2_representations_tpu.train.main import main

    main([
        "--model", "tiny-e2e-model",
        "--dataset-type", "synthetic",
        "--train-num-samples", "16",
        "--batch-size", "2",  # per-device; global 16 -> one step, local blocks of 2
        "--epochs", "1",
        "--warmup", "1",
        "--precision", "fp32",
        "--use_dino_general",
        "--lambda_soft", "0.5",
        "--soft_mode", "kl_teacher",
        "--lambda_weighted", "0.2",
        "--synthetic-dino-dim", "24",
        "--logs", str(tmp_path),
        "--name", "dino-smoke",
        "--log-every-n-steps", "1",
        "--workers", "2",
    ])
    steps = json.loads((tmp_path / "dino-smoke" / "loss_steps.json").read_text())
    assert any("soft_loss" in s for s in steps)


def test_cli_dino_synthetic_default_is_hermetic(tmp_path):
    """Plain `--dataset-type synthetic --use_dino_general` (no dim, no
    teacher name) must stay hermetic: random 384-dim features, no HF
    download attempt (round-2 behavior; r3 code-review finding #3)."""
    from refining_clip_via_dinov2_representations_tpu.train.main import main

    main([
        "--model", "tiny-e2e-model",
        "--dataset-type", "synthetic",
        "--train-num-samples", "16",
        "--batch-size", "2",
        "--epochs", "1",
        "--warmup", "1",
        "--precision", "fp32",
        "--use_dino_general",
        "--lambda_soft", "0.5",
        "--soft_mode", "kl_teacher",
        "--logs", str(tmp_path),
        "--name", "dino-default-smoke",
        "--log-every-n-steps", "1",
        "--workers", "2",
    ])
    steps = json.loads(
        (tmp_path / "dino-default-smoke" / "loss_steps.json").read_text()
    )
    assert steps and any(s.get("soft_loss", 0) > 0 for s in steps)


def test_cli_live_dino_teacher_training(tmp_path):
    """Live-teacher mode through the CLI (VERDICT r2 Missing #1 /
    BASELINE configs 2-3): --use_dino_general WITHOUT --dino_fts_path and
    WITHOUT synthetic features builds the flax DINOv2 from --dino_model_name
    and runs its frozen forward inside the compiled step."""
    from transformers import Dinov2Config, Dinov2Model

    from refining_clip_via_dinov2_representations_tpu.train.main import main

    teacher_dir = tmp_path / "tiny-dino"
    Dinov2Model(
        Dinov2Config(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, patch_size=8, image_size=16,
        )
    ).save_pretrained(teacher_dir)

    main([
        "--model", "tiny-e2e-model",
        "--dataset-type", "synthetic",
        "--train-num-samples", "16",
        "--batch-size", "2",
        "--epochs", "1",
        "--warmup", "1",
        "--precision", "fp32",
        "--use_dino_general",
        "--lambda_soft", "0.5",
        "--soft_mode", "kl_teacher",
        "--lambda_weighted", "0.2",
        "--use_projection", "--projection_type", "linear",
        "--dino_model_name", str(teacher_dir),
        "--logs", str(tmp_path),
        "--name", "live-dino-smoke",
        "--log-every-n-steps", "1",
        "--workers", "2",
    ])
    steps = json.loads((tmp_path / "live-dino-smoke" / "loss_steps.json").read_text())
    assert steps, "no training steps recorded"
    assert any("soft_loss" in s for s in steps), "live teacher produced no soft term"
    for s in steps:
        assert np.isfinite(s["total_loss"])
        if "soft_loss" in s:
            assert np.isfinite(s["soft_loss"])


def test_cli_device_preprocess_uint8_path(tmp_path):
    """--device-preprocess: host ships uint8 raw batches, the step crops +
    normalizes on-device (VERDICT weak #5 — the XLA-fused input path)."""
    from refining_clip_via_dinov2_representations_tpu.train.main import main

    main([
        "--model", "tiny-e2e-model",
        "--dataset-type", "synthetic",
        "--train-num-samples", "32",
        "--batch-size", "2",
        "--epochs", "1",
        "--warmup", "1",
        "--lr", "1e-3",
        "--precision", "fp32",
        "--device-preprocess", "--device-preprocess-raw-size", "24",
        "--logs", str(tmp_path),
        "--name", "devpp",
        "--log-every-n-steps", "1",
        "--workers", "2",
    ])
    steps = json.loads((tmp_path / "devpp" / "loss_steps.json").read_text())
    assert steps and np.isfinite(steps[-1]["total_loss"])


def test_device_preprocess_batch_is_uint8(tmp_path):
    """The raw transform really ships uint8 at the raw size."""
    from refining_clip_via_dinov2_representations_tpu.transform import (
        raw_uint8_transform,
    )

    t = raw_uint8_transform(24)
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (37, 61, 3), dtype=np.uint8)
    )
    out = t(img)
    assert out.dtype == np.uint8 and out.shape == (24, 24, 3)

    from refining_clip_via_dinov2_representations_tpu.ops.preprocess import (
        preprocess_train_batch,
    )

    batch = np.stack([out] * 4)
    dev = preprocess_train_batch(jax.random.PRNGKey(0), batch, (16, 16))
    assert dev.shape == (4, 16, 16, 3) and dev.dtype == np.float32
    # normalized: roughly zero-centered, not 0..255
    assert float(np.abs(np.asarray(dev)).max()) < 10.0


def _write_csv_dataset(tmp_path, n_images=4, caps_per_img=2):
    import pandas as pd

    rows = []
    rng = np.random.default_rng(0)
    for i in range(n_images):
        p = tmp_path / f"img_{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)).save(p)
        for c in range(caps_per_img):
            rows.append({"filepath": str(p), "title": f"caption {i} variant {c}"})
    csv = tmp_path / "data.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return csv


def test_csv_dataset_and_loader(tmp_path):
    from refining_clip_via_dinov2_representations_tpu.tokenizer import SimpleTokenizer
    from refining_clip_via_dinov2_representations_tpu.train.data import CsvDataset, Loader
    from refining_clip_via_dinov2_representations_tpu.transform import image_transform

    csv = _write_csv_dataset(tmp_path)
    ds = CsvDataset(
        str(csv), image_transform(16, is_train=False), "filepath", "title",
        tokenizer=SimpleTokenizer(context_length=12), return_image_id=True,
    )
    assert len(ds) == 8
    loader = Loader(ds, batch_size=4, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["images"].shape == (4, 16, 16, 3)
    assert batches[0]["texts"].shape == (4, 12)
    assert len(batches[0]["image_path"]) == 4


def test_csv_dino_map_validation_error(tmp_path):
    from refining_clip_via_dinov2_representations_tpu.train.data import CsvDataset
    from refining_clip_via_dinov2_representations_tpu.transform import image_transform

    csv = _write_csv_dataset(tmp_path)
    with pytest.raises(RuntimeError, match="CSV ↔ DINO map mismatch"):
        CsvDataset(
            str(csv), image_transform(16, is_train=False), "filepath", "title",
            dino_index_map={"/nonexistent/path.jpg": 0},
        )


def test_dino_feature_store_pt_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from refining_clip_via_dinov2_representations_tpu.train.data import DinoFeatureStore

    feats = np.random.default_rng(0).normal(size=(10, 6)).astype(np.float32)
    pt = tmp_path / "feats.pt"
    torch.save(torch.from_numpy(feats), pt)
    store = DinoFeatureStore(str(pt))
    np.testing.assert_allclose(store.take([2, 5]), feats[[2, 5]])
    with pytest.raises(ValueError, match="Out-of-range"):
        store.take([99])


def test_webdataset_reader(tmp_path):
    from refining_clip_via_dinov2_representations_tpu.tokenizer import SimpleTokenizer
    from refining_clip_via_dinov2_representations_tpu.train.webdataset import (
        WdsLoader,
        expand_urls,
    )
    from refining_clip_via_dinov2_representations_tpu.transform import image_transform

    assert expand_urls("s-{000..002}.tar") == ["s-000.tar", "s-001.tar", "s-002.tar"]

    rng = np.random.default_rng(0)
    for shard in range(2):
        with tarfile.open(tmp_path / f"shard-{shard}.tar", "w") as tf:
            for i in range(6):
                key = f"{shard}_{i}"
                img = Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{key}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cap = f"caption {key}".encode()
                info = tarfile.TarInfo(f"{key}.txt")
                info.size = len(cap)
                tf.addfile(info, io.BytesIO(cap))

    loader = WdsLoader(
        str(tmp_path / "shard-{0..1}.tar"),
        preprocess_img=image_transform(16, is_train=False),
        tokenizer=SimpleTokenizer(context_length=12),
        batch_size=4,
        num_samples=12,
        is_train=True,
        shuffle_buffer=4,
    )
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["images"].shape == (4, 16, 16, 3)
    assert batches[0]["texts"].dtype == np.int32


def test_retrieval_metrics_known_case():
    """Hand-checkable case: 2 images, 4 captions (2 each), near-perfect feats."""
    img = np.eye(2, 4, dtype=np.float32)          # img0 -> e0, img1 -> e1
    txt = np.array(
        [[1, 0.1, 0, 0], [1, -0.1, 0, 0],          # captions of img0
         [0, 1, 0.1, 0], [0.2, 1, 0, 0]],          # captions of img1
        np.float32,
    )
    cap2img = [0, 0, 1, 1]
    m = clip_retrieval_metrics(img, txt, cap2img)
    assert m["text_to_image_R@1"] == 100.0
    assert m["image_to_text_R@1"] == 100.0
    assert m["text_to_image_mean_rank"] == 1.0
    assert 0 < m["modality_gap"] < 2.0


def test_unique_image_features_first_occurrence():
    feats = np.arange(12, dtype=np.float32).reshape(6, 2)
    cap2img = [0, 0, 1, 1, 0, 2]
    out = build_unique_image_features(feats, cap2img)
    np.testing.assert_array_equal(out[0], feats[0])  # first row wins
    np.testing.assert_array_equal(out[1], feats[2])
    np.testing.assert_array_equal(out[2], feats[5])


def test_checkpoint_save_restore(tmp_path):
    import jax.numpy as jnp
    import optax

    from refining_clip_via_dinov2_representations_tpu.train.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from refining_clip_via_dinov2_representations_tpu.train.step import (
        create_train_state,
    )

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = optax.adam(1e-3)
    state = create_train_state(jax.random.PRNGKey(0), params, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    save_checkpoint(str(tmp_path), state, epoch=3)
    save_checkpoint(str(tmp_path), state, epoch=10)
    latest = latest_checkpoint(str(tmp_path))
    assert latest.endswith("epoch_10")

    fresh = create_train_state(jax.random.PRNGKey(1), params, tx)
    restored, epoch, step_in_epoch, order = restore_checkpoint(latest, fresh)
    assert epoch == 10 and step_in_epoch == 0 and order == {}
    assert int(restored.step) == 7
    # the step PRNG key travels with the checkpoint (mid-epoch resume)
    np.testing.assert_array_equal(
        np.asarray(restored.rng), np.asarray(jax.random.PRNGKey(0))
    )
    np.testing.assert_allclose(
        np.asarray(restored.params["model"]["w"]), np.ones((4, 4))
    )

    # preemption saves sort after their epoch sibling but before later epochs
    save_checkpoint(str(tmp_path), state, epoch=10, name_suffix="_preempt")
    assert latest_checkpoint(str(tmp_path)).endswith("epoch_10_preempt")
    save_checkpoint(str(tmp_path), state, epoch=11)
    assert latest_checkpoint(str(tmp_path)).endswith("epoch_11")


def test_cli_save_on_preemption(tmp_path):
    """--save-on-preemption: SIGTERM mid-run -> clean exit with a
    discoverable checkpoint, no periodic saves enabled."""
    import os
    import signal
    import threading

    from refining_clip_via_dinov2_representations_tpu.train.checkpoint import (
        latest_checkpoint,
    )
    from refining_clip_via_dinov2_representations_tpu.train.main import main

    # the handler installs inside main(); a pre-handler absorbs any signal
    # that lands before installation on a slow host, and the sender RESENDS
    # every 10 s so an absorbed signal is re-delivered once main()'s real
    # handler is up (idempotent there: it just sets the stop event)
    fired = threading.Event()
    prev = signal.signal(signal.SIGTERM, lambda *_: fired.set())
    stop_sending = threading.Event()

    def _send_until_stopped():
        while not stop_sending.is_set():
            os.kill(os.getpid(), signal.SIGTERM)
            stop_sending.wait(10.0)

    timer = threading.Timer(20.0, _send_until_stopped)
    timer.start()
    try:
        main([
            "--model", "tiny-e2e-model",
            "--dataset-type", "synthetic",
            "--train-num-samples", "64",
            "--batch-size", "2",
            "--epochs", "200",          # far more than can run before SIGTERM
            "--warmup", "2",
            "--lr", "1e-3",
            "--precision", "fp32",
            "--logs", str(tmp_path),
            "--name", "preempt",
            "--save-frequency", "0",    # only the preemption save may write
            "--save-on-preemption",
            "--workers", "2",
        ])
    finally:
        stop_sending.set()
        timer.cancel()
        signal.signal(signal.SIGTERM, prev)

    ckpt_dir = str(tmp_path / "preempt" / "checkpoints")
    latest = latest_checkpoint(ckpt_dir)
    assert latest is not None, "preemption save did not write a checkpoint"
    # the partial-epoch save uses a distinct _preempt dir (it must never
    # overwrite the newest completed checkpoint), discoverable by latest
    import re

    m = re.search(r"epoch_(\d+)_preempt$", latest)
    assert m is not None, latest
    assert int(m.group(1)) < 199


def test_cli_mid_epoch_resume_continues_exactly(tmp_path):
    """Mid-epoch resume (round-3 preemption upgrade): --stop-after-steps N
    ends the run through the preemption path with a checkpoint recording the
    mid-epoch position; `--resume latest` CONTINUES the epoch at step N+1
    (loader skips the consumed batches) and, because the step PRNG key and the
    epoch-seeded data order travel with the checkpoint, the continued steps
    reproduce an uninterrupted run's losses exactly."""
    from refining_clip_via_dinov2_representations_tpu.train.main import main

    cache = str(tmp_path / "xla_cache")
    common = [
        "--model", "tiny-e2e-model",
        "--dataset-type", "synthetic",
        "--train-num-samples", "64",   # global batch 16 -> 4 optimizer steps
        "--batch-size", "2",
        "--epochs", "1",
        "--warmup", "2",
        "--lr", "1e-3",
        "--precision", "fp32",
        "--logs", str(tmp_path),
        "--log-every-n-steps", "1",
        "--workers", "2",
        "--seed", "0",
        "--compile-cache", cache,
    ]
    main(common + ["--name", "straight"])
    straight = json.loads((tmp_path / "straight" / "loss_steps.json").read_text())
    assert [r["step"] for r in straight] == [1, 2, 3, 4]

    main(common + ["--name", "resumed", "--stop-after-steps", "2",
                   "--save-frequency", "0"])
    ckpt_dir = tmp_path / "resumed" / "checkpoints"
    assert (ckpt_dir / "epoch_0_preempt").is_dir()

    main(common + ["--name", "resumed", "--resume", "latest"])
    resumed = json.loads((tmp_path / "resumed" / "loss_steps.json").read_text())
    # continued at step 3 of epoch 0 (no redo of steps 1-2), AND the final
    # artifact preserves the first incarnation's records — the whole run's
    # history, not just the post-resume slice
    assert [r["step"] for r in resumed] == [1, 2, 3, 4]
    assert all(r["epoch"] == 0 for r in resumed)
    assert (ckpt_dir / "epoch_1").is_dir()
    # every step matches the uninterrupted run bit-for-bit: params, optimizer
    # state, PRNG key, and batch order all survived the preempt save
    # (fp32 + shared compile cache => deterministic replay)
    by_step = {r["step"]: r for r in straight}
    for r in resumed:
        ref = by_step[r["step"]]
        np.testing.assert_allclose(r["total_loss"], ref["total_loss"], rtol=0, atol=0)
        np.testing.assert_allclose(r["logit_scale"], ref["logit_scale"], rtol=0, atol=0)

    # the --stop-after-steps budget is run-level, spanning epochs: 4
    # steps/epoch, budget 6 -> stops at optimizer step 2 of epoch 1
    # (argparse last-wins lets --epochs 2 override the common value)
    main(common + ["--name", "budget", "--epochs", "2",
                   "--stop-after-steps", "6", "--save-frequency", "0"])
    assert (tmp_path / "budget" / "checkpoints" / "epoch_1_preempt").is_dir()
    budget = json.loads((tmp_path / "budget" / "loss_steps.json").read_text())
    assert [(r["epoch"], r["step"]) for r in budget] == [
        (0, 1), (0, 2), (0, 3), (0, 4), (1, 5), (1, 6),
    ]

    # data-order guard: the preempt save recorded seed 0; resuming with a
    # different seed invalidates the step_in_epoch skip, so the run redoes
    # epoch 1 from its start (4 fresh steps) instead of skipping 2 batches
    # that now index a different permutation. The preloaded history (steps
    # 1-6) is preserved ahead of the redo's records.
    main(common + ["--name", "budget", "--epochs", "2", "--seed", "1",
                   "--resume", "latest"])
    redo = json.loads((tmp_path / "budget" / "loss_steps.json").read_text())
    assert [(r["epoch"], r["step"]) for r in redo] == [
        (0, 1), (0, 2), (0, 3), (0, 4), (1, 5), (1, 6),
        (1, 7), (1, 8), (1, 9), (1, 10),
    ]


def test_async_checkpoint_save_restore(tmp_path):
    """--async-checkpoint: back-to-back async saves (wait-at-entry
    serializes them), epoch_latest alias, wait_for_checkpoints drain, and a
    byte-identical restore."""
    import jax.numpy as jnp
    import optax

    from refining_clip_via_dinov2_representations_tpu.train.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
        wait_for_checkpoints,
    )
    from refining_clip_via_dinov2_representations_tpu.train.step import (
        create_train_state,
    )

    params = {"w": jnp.arange(16.0).reshape(4, 4), "b": jnp.zeros((4,))}
    tx = optax.adam(1e-3)
    state = create_train_state(jax.random.PRNGKey(0), params, tx)
    state = state.replace(step=jnp.asarray(11, jnp.int32))

    save_checkpoint(str(tmp_path), state, epoch=1, async_save=True,
                    save_most_recent=True)
    save_checkpoint(str(tmp_path), state, epoch=2, async_save=True,
                    save_most_recent=True, delete_previous=True)
    wait_for_checkpoints()

    assert not (tmp_path / "epoch_1").exists()  # delete_previous
    assert (tmp_path / "epoch_latest").is_dir()
    latest = latest_checkpoint(str(tmp_path))
    assert latest.endswith("epoch_2")

    fresh = create_train_state(jax.random.PRNGKey(1), params, tx)
    restored, epoch, _, _ = restore_checkpoint(latest, fresh)
    assert epoch == 2 and int(restored.step) == 11
    np.testing.assert_array_equal(
        np.asarray(restored.params["model"]["w"]), np.arange(16.0).reshape(4, 4)
    )


def test_loader_multihost_sharding():
    """Hosts get disjoint equal shards and identical batch counts."""
    from refining_clip_via_dinov2_representations_tpu.train.data import (
        Loader,
        SyntheticDataset,
    )

    class IdxDataset:
        def __len__(self):
            return 37

        def __getitem__(self, i):
            return {"idx": np.int64(i)}

    seen = []
    lens = []
    for rank in range(3):
        loader = Loader(IdxDataset(), batch_size=4, shuffle=True, drop_last=True,
                        seed=7, num_workers=1, process_index=rank, process_count=3)
        idxs = [int(i) for b in loader for i in b["idx"]]
        seen.append(set(idxs))
        lens.append(len(idxs))
    assert len(set(lens)) == 1  # lockstep
    assert not (seen[0] & seen[1]) and not (seen[1] & seen[2])


def test_cli_resume_latest(tmp_path):
    """Train 1 epoch, then resume latest and continue to epoch 2."""
    from refining_clip_via_dinov2_representations_tpu.train.main import main

    common = [
        "--model", "tiny-e2e-model",
        "--dataset-type", "synthetic",
        "--train-num-samples", "16",
        "--batch-size", "1",  # per-device; global 8 -> 2 steps/epoch
        "--warmup", "1",
        "--lr", "1e-3",
        "--precision", "fp32",
        "--logs", str(tmp_path),
        "--name", "resume-run",
        "--log-every-n-steps", "1",
        "--workers", "2",
        "--save-most-recent",
    ]
    main(common + ["--epochs", "1"])
    ckpts = tmp_path / "resume-run" / "checkpoints"
    assert (ckpts / "epoch_1").exists()

    main(common + ["--epochs", "2", "--resume", "latest"])
    assert (ckpts / "epoch_2").exists()
    steps = json.loads((tmp_path / "resume-run" / "loss_steps.json").read_text())
    # second run trains from step 3 (2 steps/epoch done before resume) and
    # merges the first incarnation's records ahead of it
    assert [r["step"] for r in steps] == [1, 2, 3, 4]
    assert [r["epoch"] for r in steps] == [0, 0, 1, 1]


def test_cli_eval_only(tmp_path):
    """No train data: eval-only path runs retrieval on the val CSV."""
    from refining_clip_via_dinov2_representations_tpu.train.main import main

    csv = _write_csv_dataset(tmp_path, n_images=4, caps_per_img=2)
    main([
        "--model", "tiny-e2e-model",
        "--val-data", str(csv),
        "--dataset-type", "csv",
        "--csv-img-key", "filepath", "--csv-caption-key", "title",
        "--batch-size", "8",
        "--precision", "fp32",
        "--logs", str(tmp_path), "--name", "eval-only",
        "--workers", "2",
        "--zeroshot-frequency", "0",
    ])
    log = (tmp_path / "eval-only" / "out.log").read_text()
    assert "text_to_image_R@1" in log


def _write_shards(tmp_path, n_shards=2, per_shard=6):
    rng = np.random.default_rng(0)
    for shard in range(n_shards):
        with tarfile.open(tmp_path / f"shard-{shard}.tar", "w") as tf:
            for i in range(per_shard):
                key = f"{shard}_{i}"
                img = Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{key}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cap = f"caption {key}".encode()
                info = tarfile.TarInfo(f"{key}.txt")
                info.size = len(cap)
                tf.addfile(info, io.BytesIO(cap))


def test_webdataset_eval_exhausts_without_num_samples(tmp_path):
    """Eval mode must exhaust the stream — `num_batches` is metadata only
    (reference: 'Eval will just exhaust the iterator')."""
    from refining_clip_via_dinov2_representations_tpu.tokenizer import SimpleTokenizer
    from refining_clip_via_dinov2_representations_tpu.train.webdataset import WdsLoader
    from refining_clip_via_dinov2_representations_tpu.transform import image_transform

    _write_shards(tmp_path)
    loader = WdsLoader(
        str(tmp_path / "shard-{0..1}.tar"),
        preprocess_img=image_transform(16, is_train=False),
        tokenizer=SimpleTokenizer(context_length=12),
        batch_size=5,
        num_samples=0,  # not specified
        is_train=False,
    )
    batches = list(loader)
    total = sum(b["images"].shape[0] for b in batches)
    assert total == 12  # all samples, including the partial final batch


def test_webdataset_resampled_streams_differ_per_host(tmp_path):
    """--dataset-resampled: each host draws an independent shard sequence
    (identical streams would duplicate rows in the global batch)."""
    from refining_clip_via_dinov2_representations_tpu.tokenizer import SimpleTokenizer
    from refining_clip_via_dinov2_representations_tpu.train.webdataset import WdsLoader
    from refining_clip_via_dinov2_representations_tpu.transform import image_transform

    _write_shards(tmp_path, n_shards=8, per_shard=1)

    def mk(pi):
        return WdsLoader(
            str(tmp_path / "shard-{0..7}.tar"),
            preprocess_img=image_transform(16, is_train=False),
            tokenizer=SimpleTokenizer(context_length=12),
            batch_size=2, num_samples=8, is_train=True, resampled=True,
            process_index=pi, process_count=2,
        )
    s0 = mk(0)._epoch_shards()
    s1 = mk(1)._epoch_shards()
    assert s0 != s1
    # and eval never resamples, even when the flag leaks through: the
    # shard list it reads has no with-replacement duplicates
    ev = mk(0)
    ev.is_train = False
    ev_shards = ev._epoch_shards()
    assert len(ev_shards) == len(set(ev_shards))


def test_webdataset_dead_shards_fail_fast(tmp_path):
    """A shard list that yields nothing must raise, not spin forever."""
    import pytest
    from refining_clip_via_dinov2_representations_tpu.tokenizer import SimpleTokenizer
    from refining_clip_via_dinov2_representations_tpu.train.webdataset import WdsLoader
    from refining_clip_via_dinov2_representations_tpu.transform import image_transform

    loader = WdsLoader(
        str(tmp_path / "missing-{0..1}.tar"),
        preprocess_img=image_transform(16, is_train=False),
        tokenizer=SimpleTokenizer(context_length=12),
        batch_size=2, num_samples=4, is_train=True,
    )
    with pytest.raises(RuntimeError, match="yielded no samples"):
        list(loader)


def test_val_loader_kwargs_not_host_sharded(monkeypatch):
    """Val loaders read the full dataset on every host (reference evaluates
    the full val set on the master rank)."""
    from types import SimpleNamespace

    import refining_clip_via_dinov2_representations_tpu.train.data as data_mod

    args = SimpleNamespace(batch_size=4, workers=1, seed=0)
    kw_train = data_mod._loader_kwargs(args, is_train=True)
    kw_val = data_mod._loader_kwargs(args, is_train=False)
    assert kw_val["process_count"] == 1 and kw_val["process_index"] == 0
    assert kw_train["process_count"] >= 1


def test_cli_resume_latest_fsdp(tmp_path):
    """Checkpoint save + `--resume latest` under ZeRO-3 (--fsdp) sharding:
    orbax gathers the data-sharded params/moments on save, and the resume
    path re-applies the FSDP shardings (main.py restore device_put)."""
    from refining_clip_via_dinov2_representations_tpu.train.main import main

    common = [
        "--model", "tiny-e2e-model",
        "--dataset-type", "synthetic",
        "--train-num-samples", "16",
        "--batch-size", "1",
        "--warmup", "1",
        "--lr", "1e-3",
        "--precision", "fp32",
        "--logs", str(tmp_path),
        "--name", "resume-fsdp",
        "--log-every-n-steps", "1",
        "--workers", "2",
        "--save-most-recent",
        "--fsdp", "--shard-opt-state", "--fsdp-min-size", "0",
    ]
    main(common + ["--epochs", "1"])
    ckpts = tmp_path / "resume-fsdp" / "checkpoints"
    assert (ckpts / "epoch_1").exists()

    main(common + ["--epochs", "2", "--resume", "latest"])
    assert (ckpts / "epoch_2").exists()
    steps = json.loads((tmp_path / "resume-fsdp" / "loss_steps.json").read_text())
    # epoch-2 training continued at global step 3, and the artifact merges
    # the first incarnation's records (steps 1-2) ahead of them
    assert [r["step"] for r in steps] == [1, 2, 3, 4]


def test_cli_profile_trace_written(tmp_path):
    """--profile traces epoch 0 and stops after profile_steps; under the
    async hot loop the stop must block on the in-flight step first (a
    truncated last step would silently poison the trace users inspect)."""
    from refining_clip_via_dinov2_representations_tpu.train.main import main

    main([
        "--model", "tiny-e2e-model",
        "--dataset-type", "synthetic",
        "--train-num-samples", "24",
        "--batch-size", "4",
        "--epochs", "1",
        "--warmup", "1",
        "--lr", "1e-3",
        "--precision", "fp32",
        "--logs", str(tmp_path),
        "--name", "prof-e2e",
        "--workers", "2",
        "--profile",
    ])
    trace_dir = tmp_path / "prof-e2e" / "profile"
    traces = list(trace_dir.rglob("*.trace.json.gz"))
    assert traces, f"no trace written under {trace_dir}"


def _write_wds_shards(tmp_path, n_shards=2, records_per_shard=36,
                      corrupt_every=3):
    """Synthetic tar shards: jpeg+txt records, every `corrupt_every`-th
    record carries INVALID jpeg bytes (decode-time drop)."""
    rng = np.random.default_rng(0)
    for shard in range(n_shards):
        with tarfile.open(tmp_path / f"shard-{shard:03d}.tar", "w") as tf:
            for i in range(records_per_shard):
                key = f"{shard}_{i:04d}"
                if i % corrupt_every == corrupt_every - 1:
                    data = b"\xff\xd8 definitely not a jpeg"
                else:
                    img = Image.fromarray(
                        rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
                    )
                    buf = io.BytesIO()
                    img.save(buf, format="JPEG")
                    data = buf.getvalue()
                info = tarfile.TarInfo(f"{key}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cap = f"a photo number {key}".encode()
                info = tarfile.TarInfo(f"{key}.txt")
                info.size = len(cap)
                tf.addfile(info, io.BytesIO(cap))
    return str(tmp_path / ("shard-{000..%03d}.tar" % (n_shards - 1)))


def test_cli_webdataset_device_preprocess_mid_epoch_resume(tmp_path):
    """Webdataset full-CLI e2e (VERDICT r3 #7): train over synthetic tar
    shards with --device-preprocess (host decodes raw uint8, the step crops
    + normalizes on-device), then a mid-epoch preemption + `--resume latest`
    exercising the raw-record skip WITH corrupt samples in the skipped
    prefix (every 3rd record is undecodable, so the 32-record prefix
    certainly contains them). The skip counts raw records — corrupt drops
    skew the resume order by design (webdataset.py skip_next_batches
    docstring; reference wds handles bad samples non-fatally too,
    `data.py:260-272`) — so the pinned guarantees are: non-fatal decode
    drops, correct step counts across the preempt/resume boundary, preserved
    history, finite losses, and a completed epoch checkpoint."""
    from refining_clip_via_dinov2_representations_tpu.train.main import main

    urls = _write_wds_shards(tmp_path)
    cache = str(tmp_path / "xla_cache")
    common = [
        "--model", "tiny-e2e-model",
        "--dataset-type", "webdataset",
        "--train-data", urls,
        "--train-num-samples", "64",   # global batch 16 -> 4 steps/epoch
        "--batch-size", "2",
        "--epochs", "1",
        "--warmup", "2",
        "--lr", "1e-3",
        "--precision", "fp32",
        "--device-preprocess",
        "--device-preprocess-raw-size", "24",
        "--logs", str(tmp_path),
        "--log-every-n-steps", "1",
        "--workers", "2",
        "--seed", "0",
        "--compile-cache", cache,
    ]

    # ---- straight run: corrupt records dropped non-fatally, epoch completes
    main(common + ["--name", "wds-straight"])
    straight = json.loads(
        (tmp_path / "wds-straight" / "loss_steps.json").read_text()
    )
    assert [r["step"] for r in straight] == [1, 2, 3, 4]
    assert all(np.isfinite(r["total_loss"]) for r in straight)
    assert (tmp_path / "wds-straight" / "checkpoints" / "epoch_1").is_dir()

    # ---- preempt at step 2, resume mid-epoch over the same shards ----
    main(common + ["--name", "wds-resumed", "--stop-after-steps", "2",
                   "--save-frequency", "0"])
    ckpt_dir = tmp_path / "wds-resumed" / "checkpoints"
    assert (ckpt_dir / "epoch_0_preempt").is_dir()

    main(common + ["--name", "wds-resumed", "--resume", "latest"])
    resumed = json.loads(
        (tmp_path / "wds-resumed" / "loss_steps.json").read_text()
    )
    # continued at step 3 (2 batches of raw records skipped, corrupt
    # included), full history preserved, epoch completed
    assert [r["step"] for r in resumed] == [1, 2, 3, 4]
    assert all(r["epoch"] == 0 for r in resumed)
    assert all(np.isfinite(r["total_loss"]) for r in resumed)
    assert (ckpt_dir / "epoch_1").is_dir()
    # pre-preemption steps are bit-identical to the straight run (same seed,
    # same shuffle order, shared compile cache); post-resume steps are the
    # documented raw-record-skip semantics (order may skew by the corrupt
    # drops in the prefix, so values are only required finite)
    for r, s in zip(resumed[:2], straight[:2]):
        np.testing.assert_allclose(r["total_loss"], s["total_loss"], rtol=0, atol=0)
