"""betterjpeg workflow test: edits composite losslessly outside changed blocks."""

import os
import subprocess
import sys

import numpy as np
from PIL import Image

import libmodjpeg_tpu as mj
from libmodjpeg_tpu.codec import decode
from libmodjpeg_tpu.pixels import to_pixels

from conftest import FIXTURE_IMAGES as IMAGES


def test_betterjpeg_script(tmp_path):
    src = f"{IMAGES}/image.jpg"
    img = mj.read_jpeg(src)
    pix = to_pixels(img, mj.COLORSPACE_RGB).copy()
    pix[40:70, 60:140] = [255, 0, 0]
    edited = tmp_path / "edited.png"
    Image.fromarray(pix).save(edited)
    out = tmp_path / "out.jpg"

    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": "/root/repo"}
    r = subprocess.run(
        [sys.executable, "/root/repo/scripts/betterjpeg.py", src,
         str(edited), str(out)], capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert "composited" in r.stdout

    orig = decode(open(src, "rb").read())
    res = decode(out.read_bytes())
    # blocks outside the edited 30x80 box (MCU-aligned) stay bit-exact
    for c, ci in enumerate(orig.components):
        r0, r1 = (40 // 16) * ci.v_samp, -(-70 // 16) * ci.v_samp
        c0, c1 = (60 // 16) * ci.h_samp, -(-140 // 16) * ci.h_samp
        a, b = orig.coefs[c].copy(), res.coefs[c].copy()
        a[r0:r1, c0:c1] = 0
        b[r0:r1, c0:c1] = 0
        np.testing.assert_array_equal(a, b, err_msg=f"component {c}")
    # the edit landed
    outpix = to_pixels(res, mj.COLORSPACE_RGB)
    region = outpix[45:65, 70:130].astype(float).mean(axis=(0, 1))
    assert region[0] > 240 and region[1] < 15


def test_betterjpeg_no_changes(tmp_path):
    src = f"{IMAGES}/image.jpg"
    img = mj.read_jpeg(src)
    pix = to_pixels(img, mj.COLORSPACE_RGB)
    edited = tmp_path / "same.png"
    Image.fromarray(pix).save(edited)
    out = tmp_path / "out.jpg"
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": "/root/repo"}
    r = subprocess.run(
        [sys.executable, "/root/repo/scripts/betterjpeg.py", src,
         str(edited), str(out)], capture_output=True, text=True, env=env)
    assert r.returncode == 0
    assert "no changes" in r.stdout
    orig = decode(open(src, "rb").read())
    res = decode(out.read_bytes())
    for c in range(3):
        np.testing.assert_array_equal(res.coefs[c], orig.coefs[c])
