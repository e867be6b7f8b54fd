"""Native JPEG decode core (native/jpeg_decoder.cpp).

The host side of the --device-preprocess input path: JPEGs decode at the
smallest M/8 DCT scale covering the raw staging size instead of full
resolution. Correctness bar: full-scale native decode matches PIL (same
libjpeg), scaled decode feeds the existing bicubic+crop tail within a loose
tolerance, and every unsupported input falls back to the PIL path.
"""

import io

import numpy as np
import pytest
from PIL import Image

from refining_clip_via_dinov2_representations_tpu.native import (
    decode_jpeg,
    load_native_jpeg,
)
from refining_clip_via_dinov2_representations_tpu.transform import (
    raw_uint8_transform,
)

pytestmark = pytest.mark.skipif(
    load_native_jpeg() is None, reason="native jpeg core unavailable (no g++/libjpeg)"
)


def _test_image(w=640, h=480):
    y, x = np.mgrid[0:h, 0:w]
    arr = np.stack(
        [(x / 3 + y / 7) % 256, (y / 2) % 256, ((x + y) / 5) % 256], -1
    ).astype(np.uint8)
    return Image.fromarray(arr)


def _jpeg_bytes(img, quality=92):
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_full_scale_matches_pil():
    data = _jpeg_bytes(_test_image())
    native = decode_jpeg(data, 0)
    assert native is not None and native.shape == (480, 640, 3)
    with Image.open(io.BytesIO(data)) as img:
        ref = np.asarray(img.convert("RGB"))
    # same libjpeg underneath — tiny IDCT implementation differences at most
    assert np.abs(native.astype(np.int16) - ref.astype(np.int16)).max() <= 2


def test_dct_scaled_shortest_edge_covers_target():
    data = _jpeg_bytes(_test_image(1024, 768))
    out = decode_jpeg(data, 256)
    assert out is not None
    h, w, c = out.shape
    assert c == 3 and min(h, w) >= 256
    # 3/8 is the smallest M/8 with 768*M/8 >= 256
    assert (h, w) == (288, 384)


def test_small_image_decodes_full_size():
    data = _jpeg_bytes(_test_image(200, 150))
    out = decode_jpeg(data, 256)  # target larger than the image: no scaling
    assert out is not None and out.shape == (150, 200, 3)


def test_grayscale_converts_to_rgb():
    img = _test_image().convert("L")
    data = _jpeg_bytes(img)
    out = decode_jpeg(data, 0)
    assert out is not None and out.shape == (480, 640, 3)
    assert np.array_equal(out[..., 0], out[..., 1])


def test_truncated_jpeg_returns_none():
    """Premature EOF is only a WARNING in libjpeg (it inserts a fake EOI and
    fabricates gray scanlines); the decoder must reject it so the PIL path
    surfaces the corruption instead of silently training on half-gray data."""
    data = _jpeg_bytes(_test_image(640, 480))
    truncated = data[: len(data) // 2]
    assert decode_jpeg(truncated, 256) is None
    assert decode_jpeg(truncated, 0) is None


def test_unsupported_inputs_return_none():
    assert decode_jpeg(b"\xff\xd8" + b"garbage" * 20, 256) is None
    png = io.BytesIO()
    _test_image(64, 64).save(png, "PNG")
    assert decode_jpeg(png.getvalue(), 256) is None  # not a JPEG
    cmyk = io.BytesIO()
    _test_image(64, 64).convert("CMYK").save(cmyk, "JPEG")
    assert decode_jpeg(cmyk.getvalue(), 256) is None  # CMYK -> PIL path


def test_raw_transform_bytes_path_close_to_pil_path(tmp_path):
    t = raw_uint8_transform(raw_size=224)
    assert t.decode_min_dim == 224
    img = _test_image(1024, 768)
    data = _jpeg_bytes(img)
    path = tmp_path / "x.jpg"
    path.write_bytes(data)

    fast = t.load_and_apply(str(path))
    with Image.open(io.BytesIO(data)) as im:
        exact = t(im.convert("RGB"))
    assert fast.shape == exact.shape == (224, 224, 3)
    assert fast.dtype == np.uint8
    # DCT prescale + bicubic vs full-res bicubic: same image content,
    # slightly different resampling — close in expectation
    diff = np.abs(fast.astype(np.int16) - exact.astype(np.int16))
    assert diff.mean() < 4.0


def test_apply_bytes_non_jpeg_falls_back_exactly(tmp_path):
    t = raw_uint8_transform(raw_size=64)
    img = _test_image(128, 96)
    png = io.BytesIO()
    img.save(png, "PNG")
    out = t.apply_bytes(png.getvalue())
    exact = t(img)
    np.testing.assert_array_equal(out, exact)
