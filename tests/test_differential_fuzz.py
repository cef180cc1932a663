"""Differential fuzz against libjpeg, both directions.

Self-roundtrip fuzzing (test_fuzz_roundtrip.py) cannot catch a symmetric
codec bug — a wrong-but-consistent bitstream.  The ground truth for JPEG
interchange here is libjpeg (the reference delegates all of its entropy
coding to it: /root/reference/src/image.c:94,191-194), so:

  A. OUR ENCODE is oracled by libjpeg's decoder: random coefficient images
     -> our encode in every mode combo -> .refbuild/dump_coefs must
     reproduce geometry, quant tables, and every coefficient.
  B. OUR DECODE is oracled on libjpeg-AUTHORED bitstreams: random pixel
     content encoded by PIL/libjpeg-turbo and losslessly transcoded by
     .refbuild/transcode_ref into huffman/optimized/progressive/arithmetic/
     restart variants -> our decode must match dump_coefs on every file.
"""

import io
import subprocess

import numpy as np
import pytest
from PIL import Image

from libmodjpeg_tpu import constants as C
from libmodjpeg_tpu.codec import decode, encode
from test_fuzz_roundtrip import MODES, SAMPLINGS, random_image
from util import assert_matches_libjpeg, make_gradient_pixels
from conftest import FIXTURE_IMAGES as IMAGES


@pytest.mark.parametrize("sampling", list(SAMPLINGS))
def test_our_encode_read_by_libjpeg(sampling, ref_tools, tmp_path):
    """Direction A: every mode combo x sampling, libjpeg as the decoder."""
    _, dump = ref_tools
    rng = np.random.RandomState((hash(sampling) + 999) % 2 ** 31)
    for mode in MODES:
        mcus_w = int(rng.randint(1, 6))
        mcus_h = int(rng.randint(1, 6))
        img = random_image(rng, sampling, mcus_w, mcus_h,
                           int(rng.randint(0, 8)), int(rng.randint(0, 8)))
        ri = int(rng.choice([0, 1, 4]))
        data = encode(img, options=mode, restart_interval=ri)
        p = tmp_path / f"{sampling}_{mode}_{ri}.jpg"
        p.write_bytes(data)
        # libjpeg's view of our file must equal what we encoded
        out = subprocess.run([dump, str(p), str(p) + ".bin"],
                             capture_output=True)
        assert out.returncode == 0, (
            f"libjpeg rejected our {sampling} mode={mode} ri={ri} file: "
            f"{out.stderr.decode()}")
        assert_matches_libjpeg(img, dump, str(p))


def _pil_sources(tmp_path):
    """libjpeg-authored source files over random pixel content."""
    rng = np.random.RandomState(2024)
    out = []
    cases = [
        ("rgb444", "RGB", "4:4:4", 95, {}),
        ("rgb422", "RGB", "4:2:2", 80, {}),
        ("rgb420", "RGB", "4:2:0", 60, {"progressive": True}),
        ("rgb420o", "RGB", "4:2:0", 85, {"optimize": True}),
        ("gray", "L", None, 75, {}),
        ("cmyk", "CMYK", None, 90, {}),
    ]
    for name, pil_mode, subsampling, q, extra in cases:
        w = int(rng.randint(40, 260))
        h = int(rng.randint(40, 260))
        pix = make_gradient_pixels(rng, w, h)
        if pil_mode == "L":
            im = Image.fromarray(pix[..., 0], "L")
        elif pil_mode == "CMYK":
            im = Image.fromarray(
                np.concatenate([pix, pix[..., :1]], axis=-1), "CMYK")
        else:
            im = Image.fromarray(pix, "RGB")
        kw = dict(quality=q, **extra)
        if subsampling:
            kw["subsampling"] = subsampling
        p = tmp_path / f"{name}.jpg"
        im.save(p, "JPEG", **kw)
        out.append(p)
    return out


def test_libjpeg_files_read_by_us(ref_tools, tmp_path):
    """Direction B: libjpeg-authored bitstreams in every entropy mode."""
    _, dump = ref_tools
    transcode = dump.replace("dump_coefs", "transcode_ref")
    variants = [
        [],
        ["optimize"],
        ["optimize", "restart", "3"],
        ["progressive"],
        ["progressive", "restart", "2"],
        ["arith"],
        ["arith", "progressive"],
        ["arith", "restart", "1"],
    ]
    n_checked = 0
    for src in _pil_sources(tmp_path):
        # the PIL-written file itself
        ours = decode(src.read_bytes())
        assert_matches_libjpeg(ours, dump, str(src))
        n_checked += 1
        for i, v in enumerate(variants):
            dst = tmp_path / f"{src.stem}_v{i}.jpg"
            subprocess.run([transcode, str(src), str(dst)] + v, check=True)
            ours = decode(dst.read_bytes())
            assert_matches_libjpeg(ours, dump, str(dst))
            n_checked += 1
    assert n_checked == 6 * 9


def test_reference_cli_output_read_by_us(ref_tools, tmp_path):
    """Direction B on real reference-binary output (its encoder defaults)."""
    modjpeg, dump = ref_tools
    dst = tmp_path / "refout.jpg"
    subprocess.run(
        [modjpeg, "-i", f"{IMAGES}/image.jpg",
         "-p", "br", "-d", f"{IMAGES}/dropon.png",
         "-y", "luminance=-40",
         "-o", str(dst)], check=True)
    ours = decode(dst.read_bytes())
    assert_matches_libjpeg(ours, dump, str(dst))
