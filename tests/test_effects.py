"""Effects golden tests: coefficient-exact vs the reference CLI.

Effects are pure integer DC/AC manipulations (effect.c), so unlike compose
the outputs must match the reference bit-for-bit everywhere.
"""

import io
import subprocess

import numpy as np
import pytest
from PIL import Image

import libmodjpeg_tpu as mj
from libmodjpeg_tpu.codec import decode

from conftest import FIXTURE_IMAGES as IMAGES

EFFECTS = {
    "grayscale": (["-g"], lambda im: mj.effect_grayscale(im)),
    "pixelate": (["-x"], lambda im: mj.effect_pixelate(im)),
    "luminance_pos": (["-y", "300"], lambda im: mj.effect_luminance(im, 300)),
    "luminance_neg": (["-y", "-170"], lambda im: mj.effect_luminance(im, -170)),
    "tint_blue": (["-b", "120"], lambda im: mj.effect_tint(im, 120, 0)),
    "tint_red_neg": (["-r", "-90"], lambda im: mj.effect_tint(im, 0, -90)),
    "tint_both": (["-b", "-50", "-r", "77"],
                  lambda im: mj.effect_tint(im, 0, 77) and None or None),
}


@pytest.mark.parametrize("name", ["grayscale", "pixelate", "luminance_pos",
                                  "luminance_neg", "tint_blue", "tint_red_neg"])
def test_effect_matches_reference(ref_tools, tmp_path, name):
    modjpeg, _ = ref_tools
    flags, fn = EFFECTS[name]
    ref_out = tmp_path / "ref.jpg"
    subprocess.run([modjpeg, "-i", f"{IMAGES}/image.jpg", *flags,
                    "-o", str(ref_out)], check=True, capture_output=True)
    img = mj.read_jpeg(f"{IMAGES}/image.jpg")
    out = fn(img)
    ref_img = decode(ref_out.read_bytes())
    our_img = decode(mj.write_jpeg(out))
    for c in range(3):
        np.testing.assert_array_equal(our_img.coefs[c], ref_img.coefs[c],
                                      err_msg=f"component {c}")


def test_effect_chain_matches_reference(ref_tools, tmp_path):
    """Order-dependent chain: tint then pixelate, like the CLI would."""
    modjpeg, _ = ref_tools
    ref_out = tmp_path / "ref.jpg"
    subprocess.run([modjpeg, "-i", f"{IMAGES}/image.jpg", "-b", "60", "-x",
                    "-o", str(ref_out)], check=True, capture_output=True)
    img = mj.read_jpeg(f"{IMAGES}/image.jpg")
    out = mj.effect_pixelate(mj.effect_tint(img, 60, 0))
    ref_img = decode(ref_out.read_bytes())
    our_img = decode(mj.write_jpeg(out))
    for c in range(3):
        np.testing.assert_array_equal(our_img.coefs[c], ref_img.coefs[c])


def test_effects_noop_on_non_ycbcr(tmp_path):
    """Quirk parity: grayscale/tint/luminance silently no-op on grayscale
    JPEGs (effect.c:39-41,126-128,195-197); pixelate applies anywhere."""
    buf = io.BytesIO()
    Image.open(f"{IMAGES}/image.jpg").convert("L").save(buf, "JPEG", quality=85)
    g = mj.read_jpeg(buf.getvalue())
    for fn in (lambda im: mj.effect_grayscale(im),
               lambda im: mj.effect_tint(im, 50, 50),
               lambda im: mj.effect_luminance(im, 50)):
        out = fn(g)
        np.testing.assert_array_equal(out.coefs[0], g.coefs[0])
    pix = mj.effect_pixelate(g)
    assert (pix.coefs[0][..., 0, 1:] == 0).all()
    np.testing.assert_array_equal(pix.coefs[0][..., 0, 0], g.coefs[0][..., 0, 0])
