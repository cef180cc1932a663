#!/usr/bin/env python3
"""betterjpeg: apply edits to a JPEG while keeping unchanged regions bit-exact.

Reimplements the reference's scripts/betterjpeg/betterjpeg.sh workflow
(betterjpeg.sh:71-77) without GraphicsMagick: given the original JPEG and an
edited version (any format), compute the changed-pixel mask, then composite
only the changed pixels back onto the original entirely in the DCT domain —
so JPEG blocks the edit did not touch keep their exact original bits.

Usage: betterjpeg.py original.jpg edited.png output.jpg [--threshold N]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import libmodjpeg_tpu as mj
from libmodjpeg_tpu.codec import decode
from libmodjpeg_tpu.dropon import read_dropon_from_raw
from libmodjpeg_tpu.pixels import to_pixels
from libmodjpeg_tpu.png_reader import decode_png


def load_pixels(path: str, like=None):
    data = open(path, "rb").read()
    if data[:3] == b"\xff\xd8\xff":
        return to_pixels(decode(data), mj.COLORSPACE_RGB)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(data)[..., :3]
    raise SystemExit(f"{path}: unsupported format (JPEG or PNG)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("original")
    ap.add_argument("edited")
    ap.add_argument("output")
    ap.add_argument("--threshold", type=int, default=0,
                    help="per-channel difference below this counts as unchanged")
    ap.add_argument("--options", default="",
                    help="encode options: any of O,P,A")
    args = ap.parse_args()

    img = mj.read_jpeg(args.original)
    orig_pix = to_pixels(img, mj.COLORSPACE_RGB).astype(np.int16)
    edit_pix = load_pixels(args.edited).astype(np.int16)
    if edit_pix.shape != orig_pix.shape:
        raise SystemExit("edited image dimensions do not match the original")

    changed = (np.abs(edit_pix - orig_pix) > args.threshold).any(axis=-1)
    if not changed.any():
        print("no changes detected; copying original losslessly")
        mj.write_jpeg(img, args.output)
        return

    # sparse overlay: edited pixels where changed, alpha 255 there, 0 elsewhere
    h, w = changed.shape
    rgba = np.zeros((h, w, 4), dtype=np.uint8)
    rgba[..., :3] = np.clip(edit_pix, 0, 255).astype(np.uint8)
    rgba[..., 3] = np.where(changed, 255, 0).astype(np.uint8)
    dropon = read_dropon_from_raw(rgba, mj.COLORSPACE_RGBA, w, h)

    out = mj.compose(img, dropon, mj.ALIGN_TOP | mj.ALIGN_LEFT, 0, 0)

    options = 0
    if "O" in args.options:
        options |= mj.OPTION_OPTIMIZE
    if "P" in args.options:
        options |= mj.OPTION_PROGRESSIVE
    if "A" in args.options:
        options |= mj.OPTION_ARITHMETRIC
    mj.write_jpeg(out, args.output, options=options)

    pct = 100.0 * changed.mean()
    print(f"composited {pct:.1f}% changed pixels; "
          f"untouched JPEG blocks preserved bit-exact")


if __name__ == "__main__":
    main()
