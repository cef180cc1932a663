"""Property mini-fuzz: random coefficient images roundtrip in every mode.

Covers sampling combinations, dimensions (incl. edge MCUs), restart
intervals and all entropy modes with seeded randomness — a cheap wide net
for codec edge cases.
"""

import numpy as np
import pytest

from libmodjpeg_tpu import constants as C
from libmodjpeg_tpu.codec import decode, encode
from libmodjpeg_tpu.model import CoefImage, ComponentInfo, Sampling

SAMPLINGS = {
    "444": [(1, 1), (1, 1), (1, 1)],
    "422": [(2, 1), (1, 1), (1, 1)],
    "420": [(2, 2), (1, 1), (1, 1)],
    "440": [(1, 2), (1, 1), (1, 1)],
    "411": [(4, 1), (1, 1), (1, 1)],
    "gray": [(1, 1)],
}


def random_image(rng, sampling_name, mcus_w, mcus_h, trim_x=0, trim_y=0):
    samp = SAMPLINGS[sampling_name]
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    W = mcus_w * 8 * max_h - trim_x
    H = mcus_h * 8 * max_v - trim_y
    comps, coefs = [], []
    for c, (sh, sv) in enumerate(samp):
        pw, ph = mcus_w * sh, mcus_h * sv
        a = np.zeros((ph, pw, 8, 8), np.int16)
        # sparse AC pattern + dense DC, values in the legal 8-bit range
        a[..., 0, 0] = rng.randint(-1024, 1024, (ph, pw))
        nz = rng.rand(ph, pw, 8, 8) < 0.15
        a[nz] = rng.randint(-1023, 1024, nz.sum()).astype(np.int16)
        a[..., 0, 0] = rng.randint(-1024, 1024, (ph, pw))
        comps.append(ComponentInfo(c + 1, sh, sv, 0 if c == 0 else 1,
                                   -(-(W * sh) // (8 * max_h)),
                                   -(-(H * sv) // (8 * max_v)), pw, ph))
        coefs.append(a)
    qt = {0: rng.randint(1, 255, (8, 8)).astype(np.uint16)}
    if len(samp) > 1:
        qt[1] = rng.randint(1, 255, (8, 8)).astype(np.uint16)
    return CoefImage(width=W, height=H,
                     jpeg_color_space=C.JCS_YCbCr if len(samp) > 1
                     else C.JCS_GRAYSCALE,
                     components=comps, coefs=coefs, quant_tables=qt,
                     sampling=Sampling(max_h, max_v))


MODES = [0, C.OPTION_OPTIMIZE, C.OPTION_PROGRESSIVE,
         C.OPTION_PROGRESSIVE | C.OPTION_OPTIMIZE, C.OPTION_ARITHMETRIC,
         C.OPTION_ARITHMETRIC | C.OPTION_PROGRESSIVE]


@pytest.mark.parametrize("sampling", list(SAMPLINGS))
def test_fuzz_roundtrip_all_modes(sampling):
    rng = np.random.RandomState(hash(sampling) % 2 ** 31)
    for trial in range(3):
        mcus_w = int(rng.randint(1, 7))
        mcus_h = int(rng.randint(1, 7))
        trim_x = int(rng.randint(0, 8))
        trim_y = int(rng.randint(0, 8))
        img = random_image(rng, sampling, mcus_w, mcus_h, trim_x, trim_y)
        for mode in MODES:
            ri = int(rng.choice([0, 1, 3, 7]))
            data = encode(img, options=mode, restart_interval=ri)
            back = decode(data)
            for c in range(img.num_components):
                np.testing.assert_array_equal(
                    back.coefs[c], img.coefs[c],
                    err_msg=f"{sampling} trial{trial} mode{mode} ri{ri} c{c}")


def test_fuzz_libjpeg_interop(ref_tools, tmp_path):
    """Spot-check fuzz outputs against the libjpeg oracle too."""
    from util import assert_matches_libjpeg

    _, dump = ref_tools
    rng = np.random.RandomState(123)
    for i, (sampling, mode, ri) in enumerate([
            ("420", C.OPTION_PROGRESSIVE, 2),
            ("422", C.OPTION_ARITHMETRIC, 0),
            ("411", 0, 5),
            ("gray", C.OPTION_ARITHMETRIC | C.OPTION_PROGRESSIVE, 0)]):
        img = random_image(rng, sampling, 3, 4, 3, 5)
        data = encode(img, options=mode, restart_interval=ri)
        p = tmp_path / f"fz{i}.jpg"
        p.write_bytes(data)
        assert_matches_libjpeg(decode(data), dump, str(p))
