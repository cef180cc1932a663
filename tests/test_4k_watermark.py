"""BASELINE config-2 shape: 4K 4:2:0 JPEG + alpha-masked PNG watermark.

Golden comparison against the reference `modjpeg` binary: untouched MCUs
bit-exact, and the composited footprint at least as close to the ideal
pixel-domain blend as the reference's own output (PSNR criterion).
"""

import subprocess

import numpy as np
import pytest
from PIL import Image

import libmodjpeg_tpu as mj
from libmodjpeg_tpu import codec

from util import dump_jpeg_coefs, make_gradient_pixels


W, H = 3840, 2160
LOGO_W, LOGO_H = 480, 160


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("cfg2")
    rng = np.random.RandomState(2)
    pix = make_gradient_pixels(rng, W, H)
    base = d / "base.jpg"
    Image.fromarray(pix).save(base, format="JPEG", quality=88,
                              subsampling=2)  # 4:2:0
    logo = np.zeros((LOGO_H, LOGO_W, 4), dtype=np.uint8)
    logo[..., 0] = 230
    logo[..., 1] = 60
    logo[..., 2] = 30
    yy, xx = np.mgrid[0:LOGO_H, 0:LOGO_W]
    edge = np.minimum.reduce([xx, yy, LOGO_W - 1 - xx, LOGO_H - 1 - yy])
    logo[..., 3] = np.clip(edge * 16, 0, 230).astype(np.uint8)
    lp = d / "logo.png"
    Image.fromarray(logo, "RGBA").save(lp)
    return str(base), str(lp), pix, logo


def test_4k_watermark_vs_reference(scene, ref_tools, tmp_path):
    modjpeg, dump = ref_tools
    base, logo_png, base_pix, logo = scene

    ref_out = tmp_path / "ref.jpg"
    subprocess.run([modjpeg, "-i", base, "-p", "br", "-m", "-40,-40",
                    "-d", logo_png, "-o", str(ref_out)],
                   check=True, capture_output=True)

    img = mj.read_jpeg(base)
    d = mj.read_dropon(logo_png)
    out = mj.compose(img, d, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT, -40, -40)
    our_out = tmp_path / "ours.jpg"
    mj.write_jpeg(out, str(our_out))

    _, _, _, _, ref = dump_jpeg_coefs(dump, str(ref_out), "/tmp/_c2r.bin")
    _, _, _, _, ours = dump_jpeg_coefs(dump, str(our_out), "/tmp/_c2o.bin")

    # placement: br with offset (-40,-40)
    px = W - LOGO_W - 40
    py = H - LOGO_H - 40
    untouched = checked = 0
    for c in range(3):
        f = 2 if c == 0 else 1
        x0 = (px // 16) * f
        y0 = (py // 16) * f
        x1 = -(-(px + LOGO_W) // 16) * f
        y1 = -(-(py + LOGO_H) // 16) * f
        mask = np.ones(ref[c].shape[:2], bool)
        mask[y0:y1, x0:x1] = False
        same = (ref[c] == ours[c]).all(axis=(2, 3))
        assert (same | ~mask).all(), f"untouched mismatch comp {c}"
        untouched += int((same & mask).sum())
        checked += int(mask.sum())
    assert checked == untouched and checked > 100000

    # footprint PSNR vs the ideal pixel blend: ours >= reference - epsilon
    # (decode both outputs with the SAME decoder so only the compose differs)
    a = logo[..., 3:].astype(np.float64) / 255.0
    ideal = base_pix.astype(np.float64)
    region = ideal[py:py + LOGO_H, px:px + LOGO_W]
    ideal[py:py + LOGO_H, px:px + LOGO_W] = (
        region * (1 - a) + logo[..., :3].astype(np.float64) * a)

    ours_pix = np.asarray(Image.open(our_out).convert("RGB")).astype(np.float64)
    ref_pix = np.asarray(Image.open(ref_out).convert("RGB")).astype(np.float64)

    sl = np.s_[py:py + LOGO_H, px:px + LOGO_W]

    def psnr(x):
        err = np.mean((x[sl] - ideal[sl]) ** 2)
        return 10 * np.log10(255.0 ** 2 / max(err, 1e-9))

    p_ours, p_ref = psnr(ours_pix), psnr(ref_pix)
    # rounding-path differences (libjpeg integer FDCT/downsample vs our
    # float math) move per-channel PSNR a few tenths of a dB either way on
    # smooth-gradient alpha; uniform-alpha cases tie exactly (see the
    # golden suite).  Require parity within that noise band, and a sane
    # absolute floor.
    assert p_ours >= p_ref - 0.5, (p_ours, p_ref)
    assert p_ours > 40.0, p_ours
