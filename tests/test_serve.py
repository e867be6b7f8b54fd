"""HTTP serving front end (serve.py): endpoints, micro-batching, parity with
direct engine calls."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from refining_clip_via_dinov2_representations_tpu.models import (
    register_model_config,
)

TINY_CFG = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 16, "patch_size": 8, "width": 32,
                   "layers": 2, "head_width": 16},
    "text_cfg": {"context_length": 12, "vocab_size": 49408, "width": 32,
                 "heads": 4, "layers": 2},
}
register_model_config("tiny-serve-model", TINY_CFG)


@pytest.fixture(scope="module")
def bundle():
    from refining_clip_via_dinov2_representations_tpu.inference import (
        create_engine,
    )
    from refining_clip_via_dinov2_representations_tpu.serve import (
        ClipServer, make_http_server,
    )

    engine, preprocess, tokenizer = create_engine(
        "tiny-serve-model", buckets=(2, 4), warm=False
    )
    server = ClipServer(engine, preprocess, tokenizer, batch_window_ms=20.0)
    httpd = make_http_server(server, host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield engine, tokenizer, server, base
    httpd.shutdown()
    server.close()


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _png_b64(rng):
    from PIL import Image

    arr = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode(), arr


def test_health(bundle):
    engine, _, _, base = bundle
    with urllib.request.urlopen(base + "/health", timeout=60) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["buckets"] == [2, 4]
    assert body["context_length"] == 12


def test_encode_text_matches_engine(bundle):
    engine, tokenizer, _, base = bundle
    texts = ["a photo of a cat", "a drawing of a dog"]
    status, body = _post(base, "/v1/encode_text", {"texts": texts})
    assert status == 200
    got = np.asarray(body["features"], np.float32)
    want = engine.encode_text(np.asarray(tokenizer(texts), np.int32))
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert np.allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-4)


def test_encode_image_and_similarity(bundle):
    engine, tokenizer, server, base = bundle
    rng = np.random.default_rng(0)
    b64s, _ = zip(*(_png_b64(rng) for _ in range(3)))
    status, body = _post(base, "/v1/encode_image", {"images_b64": list(b64s)})
    assert status == 200
    feats = np.asarray(body["features"], np.float32)
    assert feats.shape == (3, 32)
    assert np.allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-4)

    status, body = _post(
        base, "/v1/similarity",
        {"texts": ["a cat", "a dog"], "images_b64": list(b64s)},
    )
    assert status == 200
    logits = np.asarray(body["logits"], np.float32)
    assert logits.shape == (3, 2)
    # recompute from the pieces: scale * img @ txt.T + bias
    txt = engine.encode_text(
        np.asarray(tokenizer(["a cat", "a dog"]), np.int32)
    )
    scale, bias = engine.logit_terms()
    np.testing.assert_allclose(logits, scale * feats @ txt.T + bias, atol=1e-4)


def test_bad_requests(bundle):
    _, _, _, base = bundle
    status, body = _post(base, "/v1/encode_text", {"texts": []})
    assert status == 400 and "texts" in body["error"]
    status, body = _post(base, "/v1/nope", {})
    assert status == 404


def test_concurrent_requests_coalesce_and_stay_correct(bundle):
    """Many simultaneous 1-text requests: the micro-batcher must coalesce
    them into fewer engine calls while every caller still gets ITS row."""
    engine, tokenizer, server, base = bundle
    texts = [f"sample number {i}" for i in range(6)]
    want = engine.encode_text(np.asarray(tokenizer(texts), np.int32))

    calls = []
    orig = server._text_batcher._fn

    def counting(x):
        calls.append(x.shape[0])
        return orig(x)

    server._text_batcher._fn = counting
    try:
        results = [None] * len(texts)

        def worker(i):
            status, body = _post(base, "/v1/encode_text", {"texts": [texts[i]]})
            assert status == 200
            results[i] = np.asarray(body["features"], np.float32)[0]

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(texts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
    finally:
        server._text_batcher._fn = orig

    for i in range(len(texts)):
        np.testing.assert_allclose(results[i], want[i], atol=1e-5)
    # coalescing is timing-dependent; with a 20 ms window and simultaneous
    # submission, 6 requests should land in clearly fewer engine calls
    assert len(calls) < 6, f"no coalescing happened: {calls}"
    assert sum(calls) == 6


def test_batcher_error_propagates_to_all_waiters():
    from refining_clip_via_dinov2_representations_tpu.serve import _Batcher

    def boom(x):
        raise RuntimeError("device exploded")

    b = _Batcher(boom, max_rows=8, window_ms=10.0)
    try:
        with pytest.raises(RuntimeError, match="device exploded"):
            b.submit(np.zeros((2, 3)))
    finally:
        b.close()


def test_create_engine_from_orbax_training_checkpoint(tmp_path):
    """Serving a mid-training checkpoint: factory.load_checkpoint accepts the
    trainer's orbax epoch_N directory directly (no torch-interop export
    needed), strict-merged against the model's own param tree."""
    import jax
    import jax.numpy as jnp
    import optax

    from refining_clip_via_dinov2_representations_tpu.inference import (
        create_engine,
    )
    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model, get_model_config, parse_model_cfg,
    )
    from refining_clip_via_dinov2_representations_tpu.models.factory import (
        load_checkpoint,
    )
    from refining_clip_via_dinov2_representations_tpu.train.checkpoint import (
        save_checkpoint,
    )
    from refining_clip_via_dinov2_representations_tpu.train.step import (
        create_train_state,
    )

    cfg = parse_model_cfg(get_model_config("tiny-serve-model"))
    model = build_model(cfg)
    rng = jax.random.PRNGKey(7)
    variables = model.init(
        rng, jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 12), jnp.int32)
    )
    state = create_train_state(
        rng, variables["params"], optax.adamw(1e-3)
    )
    path = save_checkpoint(str(tmp_path / "checkpoints"), state, epoch=3)

    # fresh init -> load the orbax dir -> params equal the saved ones
    fresh = model.init(
        jax.random.PRNGKey(8), jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1, 12), jnp.int32),
    )
    loaded, (missing, unexpected) = load_checkpoint(model, fresh, path)
    assert not missing and not unexpected
    jax.tree.map(
        np.testing.assert_array_equal, loaded["params"], variables["params"]
    )

    # and the full serving bundle consumes the dir
    engine, _, tokenizer = create_engine(
        "tiny-serve-model", checkpoint=path, buckets=(2,), warm=False
    )
    ids = np.asarray(tokenizer(["a cat"]), np.int32)
    feats = engine.encode_text(ids)
    assert feats.shape == (1, 32) and np.isfinite(feats).all()


def test_load_checkpoint_rejects_non_checkpoint_dir(tmp_path):
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from refining_clip_via_dinov2_representations_tpu.models import (
        build_model, get_model_config, parse_model_cfg,
    )
    from refining_clip_via_dinov2_representations_tpu.models.factory import (
        load_checkpoint,
    )

    cfg = parse_model_cfg(get_model_config("tiny-serve-model"))
    model = build_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1, 12), jnp.int32),
    )
    (tmp_path / "not_a_ckpt").mkdir()
    with _pytest.raises(Exception):
        load_checkpoint(model, variables, str(tmp_path / "not_a_ckpt"))


TINY_COCA_SERVE = {
    "embed_dim": 32,
    "vision_cfg": {
        "image_size": 16, "patch_size": 8, "width": 32, "layers": 2,
        "head_width": 16, "attentional_pool": True, "attn_pooler_queries": 6,
        "attn_pooler_heads": 2, "output_tokens": True,
    },
    "text_cfg": {
        "context_length": 12, "vocab_size": 49408, "width": 32, "heads": 4,
        "layers": 2, "embed_cls": True, "output_tokens": True,
    },
    "multimodal_cfg": {
        "context_length": 12, "vocab_size": 49408, "width": 32, "heads": 4,
        "layers": 2, "attn_pooler_heads": 2,
    },
    "custom_text": True,
}
register_model_config("tiny-serve-coca", TINY_COCA_SERVE)


def test_caption_endpoint_coca():
    from refining_clip_via_dinov2_representations_tpu.inference import (
        create_engine,
    )
    from refining_clip_via_dinov2_representations_tpu.serve import (
        ClipServer, make_http_server,
    )

    engine, preprocess, tokenizer = create_engine(
        "tiny-serve-coca", buckets=(2,), warm=False
    )
    server = ClipServer(engine, preprocess, tokenizer, batch_window_ms=5.0)
    httpd = make_http_server(server, host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        img1, _ = _png_b64(np.random.default_rng(0))
        img2, _ = _png_b64(np.random.default_rng(1))
        code, out = _post(base, "/v1/caption", {
            "images_b64": [img1, img2], "seq_len": 8, "num_beams": 2,
            "num_beam_groups": 1, "min_seq_len": 2,
        })
        assert code == 200, out
        caps = out["captions"]
        assert len(caps) == 2 and all(isinstance(c, str) for c in caps)
        # deterministic beam search -> same image, same caption
        code2, out2 = _post(base, "/v1/caption", {
            "images_b64": [img1], "seq_len": 8, "num_beams": 2,
            "num_beam_groups": 1, "min_seq_len": 2,
        })
        assert code2 == 200 and out2["captions"][0] == caps[0]
    finally:
        httpd.shutdown()
        server.close()


def test_caption_endpoint_rejects_non_coca(bundle):
    _, _, _, base = bundle
    img, _ = _png_b64(np.random.default_rng(2))
    code, out = _post(base, "/v1/caption", {"images_b64": [img]})
    assert code == 400 and "CoCa" in out["error"]


def test_caption_endpoint_validates_generation_params(bundle):
    """Generation params are compile-keyed — the endpoint bounds them
    (seq_len<=context, num_beams<=16, known keys only) before any compile."""
    _, _, _, base = bundle
    img, _ = _png_b64(np.random.default_rng(3))
    for bad in ({"seq_len": 100000}, {"num_beams": 64},
                {"temperature": 2.0}, {"repetition_penalty": 0.0}):
        code, out = _post(base, "/v1/caption", {"images_b64": [img], **bad})
        assert code == 400, (bad, out)
