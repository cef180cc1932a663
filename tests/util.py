"""Shared test helpers: libjpeg coefficient-dump oracle parsing, float DCT."""

import io
import struct
import subprocess

import numpy as np


def encode_pil(pixels, mode="RGB", quality=85, subsampling=None,
               progressive=False):
    """Encode a uint8 pixel array to JPEG bytes via PIL (independent
    libjpeg-turbo producer).  subsampling: "444"/"422"/"420" or None."""
    from PIL import Image, ImageFile

    ImageFile.MAXBLOCK = max(ImageFile.MAXBLOCK, 1 << 26)  # progressive save
    im = Image.fromarray(pixels)
    if mode != "RGB":
        im = im.convert(mode)
    kw = {"quality": quality, "progressive": progressive}
    if subsampling is not None:
        kw["subsampling"] = {"444": 0, "422": 1, "420": 2}[subsampling]
    buf = io.BytesIO()
    im.save(buf, "JPEG", **kw)
    return buf.getvalue()


def load_dump(path):
    """Parse tools/dump_coefs.c output."""
    with open(path, "rb") as f:
        d = f.read()
    off = 0
    w, h, n = struct.unpack_from("<iii", d, off)
    off += 12
    comps = []
    for _ in range(n):
        comps.append(struct.unpack_from("<6i", d, off))
        off += 24
    quants = []
    for _ in range(n):
        quants.append(np.frombuffer(d, "<i4", 64, off).reshape(8, 8).copy())
        off += 256
    coefs = []
    for c in range(n):
        _, _, _, _, wib, hib = comps[c]
        a = np.frombuffer(d, "<i2", hib * wib * 64, off).reshape(hib, wib, 8, 8)
        coefs.append(a.copy())
        off += hib * wib * 128
    return w, h, comps, quants, coefs


def dump_jpeg_coefs(dump_tool, jpeg_path, out_path="/tmp/_dump.bin"):
    subprocess.run([dump_tool, jpeg_path, out_path], check=True)
    return load_dump(out_path)


def assert_matches_libjpeg(img, dump_tool, jpeg_path):
    """Assert a decoded CoefImage equals libjpeg's view of the same file."""
    w, h, comps, quants, refcoefs = dump_jpeg_coefs(dump_tool, jpeg_path)
    assert img.width == w and img.height == h
    assert img.num_components == len(comps)
    for c, (cid, hh, vv, qno, wib, hib) in enumerate(comps):
        ci = img.components[c]
        assert (ci.component_id, ci.h_samp, ci.v_samp) == (cid, hh, vv)
        assert (ci.width_in_blocks, ci.height_in_blocks) == (wib, hib)
        np.testing.assert_array_equal(img.coefs[c][:hib, :wib], refcoefs[c])
        np.testing.assert_array_equal(
            img.quant_tables[ci.quant_tbl_no].astype(int), quants[c]
        )


def make_gradient_pixels(rng, w, h):
    """Photo-like uint8 [h, w, 3] pixels: smooth gradients + block texture."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 128 + 70 * np.sin(xx / 23.0) * np.cos(yy / 17.0)
    tex = rng.randn(h // 8 + 1, w // 8 + 1).astype(np.float32) * 12
    tex = np.kron(tex, np.ones((8, 8), np.float32))[:h, :w]
    img = np.stack([base + tex, base * 0.9 + tex, base * 1.05 - tex * 0.5],
                   axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


def dct_matrix():
    """Orthonormal 8x8 DCT-II matrix (JPEG's DCT scaling)."""
    T = np.zeros((8, 8))
    for u in range(8):
        cu = np.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            T[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return T
