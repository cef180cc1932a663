"""Golden compose tests against the reference modjpeg CLI.

The contract (BASELINE.md): untouched MCUs bit-exact vs the reference
output; PSNR inside the composited footprint >= the reference's own (both
measured against the ideal pixel-domain blend).
"""

import subprocess

import numpy as np
import pytest

import libmodjpeg_tpu as mj
from libmodjpeg_tpu.codec import decode
from libmodjpeg_tpu.pixels import to_pixels
from libmodjpeg_tpu.png_reader import decode_png

from conftest import FIXTURE_IMAGES as IMAGES


def run_reference(modjpeg, out_path, *args):
    subprocess.run([modjpeg, *args, "-o", str(out_path)], check=True,
                   capture_output=True)


def footprint_blocks(img, pos_x, pos_y, w, h):
    """Per-component block slices covering the MCU-aligned overlay region."""
    hf, vf = img.sampling.h_factor, img.sampling.v_factor
    bx0, by0 = max(0, pos_x) // hf, max(0, pos_y) // vf
    x1 = min(img.width, max(0, pos_x) + w)
    y1 = min(img.height, max(0, pos_y) + h)
    slices = []
    for ci in img.components:
        fh = img.sampling.max_h_samp // ci.h_samp
        fv = img.sampling.max_v_samp // ci.v_samp
        r0, c0 = by0 * ci.v_samp, bx0 * ci.h_samp
        r1 = -(-y1 // (8 * fv))
        c1 = -(-x1 // (8 * fh))
        slices.append((slice(r0, r1), slice(c0, c1)))
    return slices


def assert_untouched_exact(ref_img, our_img, slices):
    for c, fp in enumerate(slices):
        a = ref_img.coefs[c].copy()
        b = our_img.coefs[c].copy()
        a[fp] = 0
        b[fp] = 0
        np.testing.assert_array_equal(a, b, err_msg=f"component {c}")


def psnr(a, b):
    mse = ((a - b) ** 2).mean()
    return 10 * np.log10(255.0 ** 2 / mse) if mse > 0 else np.inf


CASES = {
    # name: (position args for ref CLI, align/offset for us)
    "topleft": (["-p", "tl"], (mj.ALIGN_TOP | mj.ALIGN_LEFT, 0, 0)),
    "bottomright": (["-p", "br"], (mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT, 0, 0)),
    "center": (["-p", "cc"], (mj.ALIGN_CENTER, 0, 0)),
    "offset_odd": (["-p", "tl", "-m", "13,7"],
                   (mj.ALIGN_TOP | mj.ALIGN_LEFT, 13, 7)),
    "offscreen_left": (["-p", "tl", "-m", "-40,-13"],
                       (mj.ALIGN_TOP | mj.ALIGN_LEFT, -40, -13)),
    "offscreen_right": (["-p", "br", "-m", "25,9"],
                        (mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT, 25, 9)),
}


@pytest.mark.parametrize("case", list(CASES))
def test_compose_png_matches_reference(ref_tools, tmp_path, case):
    modjpeg, _ = ref_tools
    posargs, (align, ox, oy) = CASES[case]
    ref_out = tmp_path / "ref.jpg"
    run_reference(modjpeg, ref_out, "-i", f"{IMAGES}/image.jpg",
                  *posargs, "-d", f"{IMAGES}/dropon.png")

    img = mj.read_jpeg(f"{IMAGES}/image.jpg")
    d = mj.read_dropon(f"{IMAGES}/dropon.png")
    out = mj.compose(img, d, align, ox, oy)
    enc = mj.write_jpeg(out)

    ref_img = decode(ref_out.read_bytes())
    our_img = decode(enc)

    # recompute reference's position math for the footprint
    if align & mj.ALIGN_LEFT:
        px = 0
    elif align & mj.ALIGN_RIGHT:
        px = img.width - d.width
    else:
        px = img.width // 2 - d.width // 2
    px += ox
    if align & mj.ALIGN_TOP:
        py = 0
    elif align & mj.ALIGN_BOTTOM:
        py = img.height - d.height
    else:
        py = img.height // 2 - d.height // 2
    py += oy

    slices = footprint_blocks(img, px, py, d.width, d.height)
    assert_untouched_exact(ref_img, our_img, slices)

    # PSNR inside the visible footprint, both vs the ideal pixel blend
    base = to_pixels(img, mj.COLORSPACE_RGB).astype(np.float64)
    rgba = decode_png(open(f"{IMAGES}/dropon.png", "rb").read()).astype(np.float64)
    x0, y0 = max(0, px), max(0, py)
    x1 = min(img.width, px + d.width)
    y1 = min(img.height, py + d.height)
    cx0, cy0 = x0 - px, y0 - py
    ideal = base.copy()
    al = rgba[cy0:cy0 + (y1 - y0), cx0:cx0 + (x1 - x0), 3:4] / 255.0
    ideal[y0:y1, x0:x1] = (base[y0:y1, x0:x1] * (1 - al)
                           + rgba[cy0:cy0 + (y1 - y0), cx0:cx0 + (x1 - x0), :3] * al)
    region = (slice(y0, y1), slice(x0, x1))
    ref_pix = to_pixels(ref_img, mj.COLORSPACE_RGB).astype(np.float64)
    our_pix = to_pixels(our_img, mj.COLORSPACE_RGB).astype(np.float64)
    p_ref = psnr(ref_pix[region], ideal[region])
    p_our = psnr(our_pix[region], ideal[region])
    assert p_our >= p_ref - 0.05, (p_our, p_ref)
    # and we should be very close to the reference's own output
    assert psnr(our_pix[region], ref_pix[region]) > 40


def test_compose_jpeg_dropon_with_mask(ref_tools, tmp_path):
    """JPEG dropon + JPEG mask (nonuniform alpha via files)."""
    modjpeg, _ = ref_tools
    ref_out = tmp_path / "ref.jpg"
    run_reference(modjpeg, ref_out, "-i", f"{IMAGES}/image.jpg", "-p", "br",
                  "-d", f"{IMAGES}/dropon.jpg,{IMAGES}/mask.jpg")

    img = mj.read_jpeg(f"{IMAGES}/image.jpg")
    d = mj.read_dropon(f"{IMAGES}/dropon.jpg", mask=f"{IMAGES}/mask.jpg")
    assert d.blend == mj.BLEND_NONUNIFORM
    out = mj.compose(img, d, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT)
    ref_img = decode(ref_out.read_bytes())
    our_img = decode(mj.write_jpeg(out))

    px, py = img.width - d.width, img.height - d.height
    slices = footprint_blocks(img, px, py, d.width, d.height)
    assert_untouched_exact(ref_img, our_img, slices)
    region = (slice(py, img.height), slice(px, img.width))
    ref_pix = to_pixels(ref_img, mj.COLORSPACE_RGB).astype(np.float64)
    our_pix = to_pixels(our_img, mj.COLORSPACE_RGB).astype(np.float64)
    # dropon decode paths differ slightly (our IDCT/upsample vs libjpeg's);
    # outputs must still be close to the reference's composite
    assert psnr(our_pix[region], ref_pix[region]) > 35


def test_compose_jpeg_dropon_uniform_blend(ref_tools, tmp_path):
    """JPEG dropon without mask: uniform BLEND_FULL overwrite."""
    modjpeg, _ = ref_tools
    ref_out = tmp_path / "ref.jpg"
    run_reference(modjpeg, ref_out, "-i", f"{IMAGES}/image.jpg", "-p", "cc",
                  "-d", f"{IMAGES}/dropon.jpg")
    img = mj.read_jpeg(f"{IMAGES}/image.jpg")
    d = mj.read_dropon(f"{IMAGES}/dropon.jpg")
    assert d.blend == mj.BLEND_FULL
    out = mj.compose(img, d, mj.ALIGN_CENTER)
    ref_img = decode(ref_out.read_bytes())
    our_img = decode(mj.write_jpeg(out))
    px = img.width // 2 - d.width // 2
    py = img.height // 2 - d.height // 2
    slices = footprint_blocks(img, px, py, d.width, d.height)
    assert_untouched_exact(ref_img, our_img, slices)
    region = (slice(py, py + d.height), slice(px, px + d.width))
    ref_pix = to_pixels(ref_img, mj.COLORSPACE_RGB).astype(np.float64)
    our_pix = to_pixels(our_img, mj.COLORSPACE_RGB).astype(np.float64)
    assert psnr(our_pix[region], ref_pix[region]) > 35


def test_compose_blend_none_is_noop():
    img = mj.read_jpeg(f"{IMAGES}/image.jpg")
    d = mj.read_dropon_from_raw(
        np.zeros((10, 10, 3), np.uint8), mj.COLORSPACE_RGB, 10, 10,
        blend=mj.BLEND_NONE)
    out = mj.compose(img, d, mj.ALIGN_CENTER)
    for c in range(3):
        np.testing.assert_array_equal(out.coefs[c], img.coefs[c])


def test_compose_fully_offscreen_is_noop():
    img = mj.read_jpeg(f"{IMAGES}/image.jpg")
    d = mj.read_dropon(f"{IMAGES}/dropon.png")
    out = mj.compose(img, d, mj.ALIGN_TOP | mj.ALIGN_LEFT, -10000, 0)
    for c in range(3):
        np.testing.assert_array_equal(out.coefs[c], img.coefs[c])


def test_compose_dropon_larger_than_image(ref_tools, tmp_path):
    """Dropon bigger than the image: crops to the full frame."""
    modjpeg, _ = ref_tools
    # build a 400x400 dropon PNG from random pixels
    from PIL import Image
    rng = np.random.RandomState(9)
    big = rng.randint(0, 255, (400, 400, 4), dtype=np.uint8)
    big_path = tmp_path / "big.png"
    Image.fromarray(big, "RGBA").save(big_path)
    ref_out = tmp_path / "ref.jpg"
    run_reference(modjpeg, ref_out, "-i", f"{IMAGES}/image.jpg", "-p", "cc",
                  "-d", str(big_path))
    img = mj.read_jpeg(f"{IMAGES}/image.jpg")
    d = mj.read_dropon(str(big_path))
    out = mj.compose(img, d, mj.ALIGN_CENTER)
    ref_img = decode(ref_out.read_bytes())
    our_img = decode(mj.write_jpeg(out))
    # whole image is the footprint; compare composite quality
    ref_pix = to_pixels(ref_img, mj.COLORSPACE_RGB).astype(np.float64)
    our_pix = to_pixels(our_img, mj.COLORSPACE_RGB).astype(np.float64)
    assert psnr(our_pix, ref_pix) > 35


def test_grayscale_target(ref_tools, tmp_path):
    """Composing onto a grayscale JPEG exercises the 1-component path."""
    import io
    from PIL import Image
    modjpeg, _ = ref_tools
    gray_path = tmp_path / "gray.jpg"
    Image.open(f"{IMAGES}/image.jpg").convert("L").save(
        gray_path, format="JPEG", quality=85)
    ref_out = tmp_path / "ref.jpg"
    run_reference(modjpeg, ref_out, "-i", str(gray_path), "-p", "tl",
                  "-d", f"{IMAGES}/dropon.png")
    img = mj.read_jpeg(str(gray_path))
    d = mj.read_dropon(f"{IMAGES}/dropon.png")
    out = mj.compose(img, d, mj.ALIGN_TOP | mj.ALIGN_LEFT)
    ref_img = decode(ref_out.read_bytes())
    our_img = decode(mj.write_jpeg(out))
    slices = footprint_blocks(img, 0, 0, d.width, d.height)
    assert_untouched_exact(ref_img, our_img, slices)
    region = (slice(0, d.height), slice(0, d.width))
    ref_pix = to_pixels(ref_img, mj.COLORSPACE_GRAYSCALE)[..., 0].astype(float)
    our_pix = to_pixels(our_img, mj.COLORSPACE_GRAYSCALE)[..., 0].astype(float)
    assert psnr(our_pix[region], ref_pix[region]) > 40


@pytest.mark.parametrize("blend", [1, 50, 128, 254])
def test_uniform_partial_blend_matches_reference(ref_tools, tmp_path, blend):
    """Arbitrary uniform blend values (README example uses blend=50) against
    the reference LIBRARY (the CLI always uses BLEND_FULL)."""
    import os
    refcompose = os.path.join(os.path.dirname(ref_tools[0]), "ref_compose")
    ref_out = tmp_path / "ref.jpg"
    align = mj.ALIGN_TOP | mj.ALIGN_LEFT
    subprocess.run(
        [refcompose, f"{IMAGES}/image.jpg", f"{IMAGES}/dropon.jpg",
         str(blend), str(align), "12", "20", str(ref_out)],
        check=True, capture_output=True)
    img = mj.read_jpeg(f"{IMAGES}/image.jpg")
    d = mj.read_dropon(f"{IMAGES}/dropon.jpg", blend=blend)
    assert d.blend == blend
    out = mj.compose(img, d, align, 12, 20)
    ref_img = decode(ref_out.read_bytes())
    our_img = decode(mj.write_jpeg(out))
    slices = footprint_blocks(img, 12, 20, d.width, d.height)
    assert_untouched_exact(ref_img, our_img, slices)
    y1 = 20 + d.height
    region = (slice(20, y1), slice(12, 12 + d.width))
    ref_pix = to_pixels(ref_img, mj.COLORSPACE_RGB).astype(np.float64)
    our_pix = to_pixels(our_img, mj.COLORSPACE_RGB).astype(np.float64)
    assert psnr(our_pix[region], ref_pix[region]) > 35


@pytest.mark.ref_oracle
def test_committed_historical_golden():
    """Against the reference repo's COMMITTED image_dropon.jpg (produced by
    the original author with their libjpeg build years ago): every block
    outside the 160x50 top-left dropon footprint must be bit-exact.

    This one inherently needs the reference checkout's fixture set
    (/root/reference/src/contrib/images) — the historical golden cannot be
    regenerated — so it uses REF_IMAGES, not the repo's own fixtures."""
    import os
    from conftest import REFERENCE
    ref_images = os.path.join(REFERENCE, "src", "contrib", "images")
    if not os.path.isdir(ref_images):
        pytest.skip("reference checkout not present (historical golden)")
    golden = decode(open(f"{ref_images}/image_dropon.jpg", "rb").read())
    assert golden.progressive

    img = mj.read_jpeg(f"{ref_images}/image.jpg")
    d = mj.read_dropon(f"{ref_images}/dropon.png")
    out = mj.compose(img, d, mj.ALIGN_TOP | mj.ALIGN_LEFT, 0, 0)
    ours = decode(mj.write_jpeg(out, options=mj.OPTION_PROGRESSIVE))

    slices = footprint_blocks(img, 0, 0, d.width, d.height)
    assert_untouched_exact(golden, ours, slices)
    # inside the footprint: the historical file was produced with a
    # different libjpeg generation (its own dropon decode + FDCT paths), so
    # expect close-but-not-identical (vs >50 dB against a freshly built
    # reference binary)
    region = (slice(0, d.height), slice(0, d.width))
    gpix = to_pixels(golden, mj.COLORSPACE_RGB).astype(np.float64)
    opix = to_pixels(ours, mj.COLORSPACE_RGB).astype(np.float64)
    assert psnr(opix[region], gpix[region]) > 30
