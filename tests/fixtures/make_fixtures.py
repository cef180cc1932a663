#!/usr/bin/env python3
"""Generate the repo's own test fixtures (no reference checkout needed).

Mirrors the shape of the reference's fixture set
(/root/reference/src/contrib/images + images/dropon.lua): a 256x256 4:2:0
baseline q85 photo-like JPEG, a 160x50 RGBA logo PNG, the same logo as an
opaque JPEG, and a 160x50 grayscale mask JPEG.  Deterministic (fixed seed),
regenerate with: python tests/fixtures/make_fixtures.py
"""

import os

import numpy as np
from PIL import Image

HERE = os.path.dirname(os.path.abspath(__file__))


def photo(w=256, h=256, seed=42):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (120 + 70 * np.sin(xx / 41.0) * np.cos(yy / 29.0)
            + 35 * np.sin((xx + 2 * yy) / 23.0))
    tex = rng.randn(h // 4 + 1, w // 4 + 1).astype(np.float32) * 10
    tex = np.kron(tex, np.ones((4, 4), np.float32))[:h, :w]
    r = base + tex
    g = 0.92 * base + tex + 12 * np.cos(yy / 17.0)
    b = 1.08 * base - 0.6 * tex + 8 * np.sin(xx / 13.0)
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


def logo(w=160, h=50, seed=7):
    """A 'wordmark': colored bars + disc on transparent ground."""
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w, 4), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    # five vertical bars of varying hue
    for i, x0 in enumerate(range(8, 120, 24)):
        sel = (xx >= x0) & (xx < x0 + 14) & (yy >= 6) & (yy < h - 6)
        img[sel] = [40 * i % 256, 255 - 35 * i, 80 + 30 * i, 255]
    # disc with soft alpha edge
    d = np.hypot(xx - 140, yy - 25)
    disc = d < 18
    img[disc, :3] = [250, 200, 30]
    img[..., 3] = np.where(disc, np.clip((18 - d) * 40, 0, 255),
                           img[..., 3]).astype(np.uint8)
    # mild noise so DCT blocks aren't trivially sparse
    noise = rng.randint(-6, 7, (h, w, 3))
    img[..., :3] = np.clip(img[..., :3].astype(int) + noise, 0, 255)
    return img


def main():
    pix = photo()
    Image.fromarray(pix).save(os.path.join(HERE, "image.jpg"),
                              quality=85, subsampling=2)
    lg = logo()
    Image.fromarray(lg, "RGBA").save(os.path.join(HERE, "dropon.png"))
    Image.fromarray(lg[..., :3]).save(os.path.join(HERE, "dropon.jpg"),
                                      quality=92, subsampling=2)
    Image.fromarray(lg[..., 3], "L").save(os.path.join(HERE, "mask.jpg"),
                                          quality=92)
    for f in ("image.jpg", "dropon.png", "dropon.jpg", "mask.jpg"):
        print(f, os.path.getsize(os.path.join(HERE, f)))


if __name__ == "__main__":
    main()
