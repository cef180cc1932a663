#!/usr/bin/env python3
"""PIL-authored interop fixtures (Pillow bundles its OWN libjpeg-turbo
build, distinct from the system library tools/make_interop_fixtures.c
uses): baseline/progressive/custom-qtable files plus an ICC profile and
EXIF, like real phone/web output.  Outputs are committed under
tests/fixtures/interop/.

Usage: python tools/make_pil_interop_fixtures.py tests/fixtures/interop
"""
import io
import struct
import sys

import numpy as np
from PIL import Image


def make_pixels(w=328, h=246):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = (128 + 80 * np.sin(xx / 23.0) * np.cos(yy / 17.0)
            + 30 * np.sin((xx + 2 * yy) / 9.0))
    tex = (((xx // 8) * 1103515245 + (yy // 8) * 12345) % 64) - 32
    img = np.stack([base + tex, base * 0.92 + tex * 0.5 + 12,
                    base * 1.06 - tex], axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


def tiny_icc():
    """A minimal structurally-valid ICC blob (enough to ride APP2 and be
    compared byte-for-byte after the round trip)."""
    body = b"ADBE" + b"\x02\x10\x00\x00" + b"mntr" + b"RGB " + b"XYZ "
    blob = body + b"interop-icc-payload" * 8
    return struct.pack(">I", len(blob) + 4) + blob


def main(outdir):
    pix = Image.fromarray(make_pixels())
    exif = Image.Exif()
    exif[0x010F] = "interop-make"            # Make
    exif[0x0110] = "pillow-turbo"            # Model

    pix.save(f"{outdir}/pil_baseline_icc_q88.jpg", quality=88,
             icc_profile=tiny_icc(), exif=exif)
    pix.save(f"{outdir}/pil_progressive_q75.jpg", quality=75,
             progressive=True, optimize=True, exif=exif)
    pix.save(f"{outdir}/pil_qtables_web_high.jpg", qtables="web_high",
             subsampling=1)
    print("wrote 3 PIL fixtures to", outdir)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
