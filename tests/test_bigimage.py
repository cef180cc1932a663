"""Huge-image pipeline (BASELINE config-4 shape): tiled JPEG, grid-sharded
effects + compose, restart-parallel entropy coding.

Default size is 25MP to keep the suite quick; set MJT_BIG=1 for the full
100MP configuration.
"""

import os
import time

import numpy as np

import libmodjpeg_tpu as mj
from libmodjpeg_tpu import codec
from libmodjpeg_tpu import constants as C
from libmodjpeg_tpu.model import CoefImage, ComponentInfo, Sampling
from libmodjpeg_tpu.parallel import GridSession, make_mesh

from conftest import FIXTURE_IMAGES as IMAGES


def synth_big(mp_target: float) -> CoefImage:
    """Synthesize a big 4:2:0 coefficient image with photo-like sparsity."""
    mcus_w = int(np.sqrt(mp_target * 1e6 * (3 / 2)) // 16)
    mcus_h = int(mp_target * 1e6 // (mcus_w * 16 * 16))
    if mcus_h % 8 == 0:
        mcus_h -= 1  # force a NON-divisible block-row count: the session
        # must shard via padding, not fall back to replication
    W, H = mcus_w * 16, mcus_h * 16
    rng = np.random.RandomState(0)
    comps, coefs = [], []
    for c, (sh, sv) in enumerate([(2, 2), (1, 1), (1, 1)]):
        pw, ph = mcus_w * sh, mcus_h * sv
        a = np.zeros((ph, pw, 8, 8), np.int16)
        a[..., 0, 0] = rng.randint(-200, 200, (ph, pw))
        a[..., 0, 1] = rng.randint(-20, 20, (ph, pw))
        a[..., 1, 0] = rng.randint(-20, 20, (ph, pw))
        comps.append(ComponentInfo(c + 1, sh, sv, 0 if c == 0 else 1,
                                   pw, ph, pw, ph))
        coefs.append(a)
    return CoefImage(
        width=W, height=H, jpeg_color_space=C.JCS_YCbCr, components=comps,
        coefs=coefs,
        quant_tables={0: np.full((8, 8), 6, np.uint16),
                      1: np.full((8, 8), 11, np.uint16)},
        sampling=Sampling(2, 2))


def test_big_image_grid_pipeline():
    mp = 100.0 if os.environ.get("MJT_BIG") else 25.0
    img = synth_big(mp)
    actual_mp = img.width * img.height / 1e6
    logo = mj.read_dropon(f"{IMAGES}/dropon.png")

    t0 = time.perf_counter()
    data = codec.encode(img, restart_interval=64)
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    back = codec.decode(data)
    t_dec = time.perf_counter() - t0
    for c in range(3):
        np.testing.assert_array_equal(back.coefs[c], img.coefs[c])

    mesh = make_mesh(batch=1, grid=8)
    t0 = time.perf_counter()
    sess = GridSession(back, mesh)
    # non-divisible row counts must still REALLY shard (8 distinct shards),
    # not silently replicate (the round-1 fallback)
    for g in sess.grids:
        assert len(g.sharding.device_set) == 8
        assert not g.sharding.is_fully_replicated
        assert g.shape[0] % 8 == 0  # padded to the mesh multiple
    sess.effect("luminance", value=60).effect("tint", cb_value=25)
    sess.compose(logo, mj.ALIGN_CENTER)
    out = sess.to_image()
    t_fx = time.perf_counter() - t0

    # effects hit every block; overlay confined to the center footprint
    q0 = int(img.quant_tables[0][0, 0])
    px = img.width // 2 - logo.width // 2
    py = img.height // 2 - logo.height // 2
    # a far-away block: DC shifted by luminance delta only
    far = out.coefs[0][0, 0, 0, 0] * q0
    orig = img.coefs[0][0, 0, 0, 0] * q0
    assert abs((far - orig) - 60) <= q0, (far, orig)
    # chroma-1 got the tint
    q1 = int(img.quant_tables[1][0, 0])
    far_cb = out.coefs[1][0, 0, 0, 0] * q1
    orig_cb = img.coefs[1][0, 0, 0, 0] * q1
    assert abs((far_cb - orig_cb) - 25) <= q1
    # chroma-2 untouched outside the overlay
    r0 = (py // 16)
    c0 = (px // 16)
    r1 = -(-(py + logo.height) // 16)
    c1 = -(-(px + logo.width) // 16)
    cr = out.coefs[2].copy()
    cr[r0:r1, c0:c1] = img.coefs[2][r0:r1, c0:c1]
    np.testing.assert_array_equal(cr, img.coefs[2])
    # overlay region actually changed in luma
    assert (out.coefs[0][r0 * 2:r1 * 2, c0 * 2:c1 * 2]
            != img.coefs[0][r0 * 2:r1 * 2, c0 * 2:c1 * 2]).any()

    t0 = time.perf_counter()
    out_data = codec.encode(out, restart_interval=64)
    t_enc2 = time.perf_counter() - t0
    back2 = codec.decode(out_data)
    for c in range(3):
        np.testing.assert_array_equal(back2.coefs[c], out.coefs[c])

    print(f"\n  {actual_mp:.1f}MP: encode {t_enc:.2f}s ({actual_mp/t_enc:.0f} MP/s), "
          f"decode {t_dec:.2f}s ({actual_mp/t_dec:.0f} MP/s), "
          f"grid effects+compose {t_fx:.2f}s, re-encode {t_enc2:.2f}s")
