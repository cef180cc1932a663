"""PNG reader + pixel-decode validation against PIL oracles."""

import io

import numpy as np
import pytest
from PIL import Image

import libmodjpeg_tpu as mj
from libmodjpeg_tpu.png_reader import decode_png
from libmodjpeg_tpu.pixels import to_pixels

from conftest import FIXTURE_IMAGES as IMAGES


def pil_png_bytes(img: Image.Image, **kw) -> bytes:
    buf = io.BytesIO()
    img.save(buf, format="PNG", **kw)
    return buf.getvalue()


def test_png_rgba_fixture():
    data = open(f"{IMAGES}/dropon.png", "rb").read()
    ours = decode_png(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("mode", ["RGB", "RGBA", "L", "LA", "P"])
def test_png_color_types(mode):
    rng = np.random.RandomState(hash(mode) % 1000)
    if mode == "P":
        base = Image.fromarray(
            rng.randint(0, 255, (40, 60, 3), np.uint8)).quantize(64)
        img = base
    elif mode in ("L", "LA"):
        arr = rng.randint(0, 255, (40, 60), np.uint8)
        img = Image.fromarray(arr, "L")
        if mode == "LA":
            img = img.convert("LA")
    else:
        ch = 4 if mode == "RGBA" else 3
        img = Image.fromarray(
            rng.randint(0, 255, (40, 60, ch), np.uint8), mode)
    data = pil_png_bytes(img)
    ours = decode_png(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
    np.testing.assert_array_equal(ours, ref)


def test_png_16bit():
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 65535, (16, 24), np.uint16)
    img = Image.fromarray(arr, "I;16")
    data = pil_png_bytes(img)
    ours = decode_png(data)
    # high byte semantics
    np.testing.assert_array_equal(ours[..., 0], (arr >> 8).astype(np.uint8))


def test_png_palette_transparency():
    img = Image.fromarray(
        np.arange(64, dtype=np.uint8).reshape(8, 8) * 4, "L").convert("P")
    img.info["transparency"] = bytes([0, 255, 128])
    data = pil_png_bytes(img, transparency=bytes([0, 255, 128]))
    ours = decode_png(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("subsampling,name", [(0, "444"), (1, "422"), (2, "420")])
def test_to_pixels_close_to_pil(subsampling, name, fixture_jpeg):
    """Our dequant+IDCT+fancy-upsample+color path vs libjpeg's integer one."""
    buf = io.BytesIO()
    Image.open(io.BytesIO(fixture_jpeg)).save(
        buf, format="JPEG", quality=88, subsampling=subsampling)
    data = buf.getvalue()
    img = mj.read_jpeg(data)
    ours = to_pixels(img, mj.COLORSPACE_RGB).astype(np.int16)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")).astype(np.int16)
    err = np.abs(ours - ref)
    assert err.mean() < 1.5, (name, err.mean())
    assert np.percentile(err, 99) <= 4, (name, np.percentile(err, 99))


def test_to_pixels_grayscale_and_ycc(fixture_jpeg):
    img = mj.read_jpeg(fixture_jpeg)
    ycc = to_pixels(img, mj.COLORSPACE_YCC)
    gray = to_pixels(img, mj.COLORSPACE_GRAYSCALE)
    assert ycc.shape == (256, 256, 3)
    assert gray.shape == (256, 256, 1)
    np.testing.assert_array_equal(gray[..., 0], ycc[..., 0])
