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
    "cmyk": [(1, 1), (1, 1), (1, 1), (1, 1)],
    "cmyk420": [(2, 2), (1, 1), (1, 1), (2, 2)],
}


def random_image(rng, sampling_name, mcus_w, mcus_h, trim_x=0, trim_y=0,
                 precision=8):
    samp = SAMPLINGS[sampling_name]
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    W = mcus_w * 8 * max_h - trim_x
    H = mcus_h * 8 * max_v - trim_y
    lim = 1024 if precision == 8 else 16384
    comps, coefs = [], []
    for c, (sh, sv) in enumerate(samp):
        pw, ph = mcus_w * sh, mcus_h * sv
        a = np.zeros((ph, pw, 8, 8), np.int16)
        # sparse AC pattern + dense DC, values in the legal coef range
        nz = rng.rand(ph, pw, 8, 8) < 0.15
        a[nz] = rng.randint(-(lim - 1), lim, nz.sum()).astype(np.int16)
        a[..., 0, 0] = rng.randint(-lim, lim, (ph, pw))
        comps.append(ComponentInfo(c + 1, sh, sv, 0 if c == 0 else 1,
                                   -(-(W * sh) // (8 * max_h)),
                                   -(-(H * sv) // (8 * max_v)), pw, ph))
        coefs.append(a)
    qt = {0: rng.randint(1, 255, (8, 8)).astype(np.uint16)}
    if len(samp) > 1:
        qt[1] = rng.randint(1, 255, (8, 8)).astype(np.uint16)
    if len(samp) == 4:
        jcs = C.JCS_CMYK
    elif len(samp) > 1:
        jcs = C.JCS_YCbCr
    else:
        jcs = C.JCS_GRAYSCALE
    return CoefImage(width=W, height=H, jpeg_color_space=jcs,
                     components=comps, coefs=coefs, quant_tables=qt,
                     sampling=Sampling(max_h, max_v), precision=precision)


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


@pytest.mark.parametrize("sampling", ["444", "420", "gray", "cmyk"])
def test_fuzz_roundtrip_12bit(sampling):
    rng = np.random.RandomState((hash(sampling) + 12) % 2 ** 31)
    for trial in range(2):
        img = random_image(rng, sampling, int(rng.randint(1, 5)),
                           int(rng.randint(1, 5)), int(rng.randint(0, 8)),
                           int(rng.randint(0, 8)), precision=12)
        for mode in MODES:
            ri = int(rng.choice([0, 2]))
            data = encode(img, options=mode, restart_interval=ri)
            back = decode(data)
            assert back.precision == 12
            for c in range(img.num_components):
                np.testing.assert_array_equal(
                    back.coefs[c], img.coefs[c],
                    err_msg=f"12bit {sampling} t{trial} mode{mode} ri{ri} c{c}")


def _first_scan_end(data: bytes) -> int:
    """Offset just past the first scan's entropy data (skipping stuffed
    FF00 and restart markers)."""
    sos = data.find(b"\xff\xda")
    assert sos >= 0
    seg_len = int.from_bytes(data[sos + 2:sos + 4], "big")
    q = sos + 2 + seg_len
    while q < len(data) - 1:
        q = data.find(b"\xff", q)
        nxt = data[q + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            q += 2
        elif nxt == 0xFF:
            q += 1
        else:
            return q
    return len(data)


def test_fuzz_dnl_patched():
    """Every mode decodes with SOF height deferred to a DNL marker
    (inserted after the FIRST scan per T.81 B.2.5)."""
    rng = np.random.RandomState(77)
    for mode in MODES:
        img = random_image(rng, "420", 3, 2, 5, 3)
        data = bytearray(encode(img, options=mode, restart_interval=2))
        for sof in (b"\xff\xc0", b"\xff\xc1", b"\xff\xc2",
                    b"\xff\xc9", b"\xff\xca"):
            i = data.find(sof)
            if i >= 0:
                break
        data[i + 5:i + 7] = (0).to_bytes(2, "big")
        cut = _first_scan_end(bytes(data))
        patched = bytes(data[:cut]) + b"\xff\xdc\x00\x04" + \
            img.height.to_bytes(2, "big") + bytes(data[cut:])
        back = decode(patched)
        assert back.height == img.height
        for c in range(img.num_components):
            np.testing.assert_array_equal(back.coefs[c], img.coefs[c])


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
