"""Dependency-scheduled parallel decode of progressive multi-scan files.

Progressive scans over disjoint components or disjoint spectral bands write
disjoint coefficients, so they decode concurrently in waves; successive-
approximation passes of the same (component, band) are ordered.  Each scan
snapshots its Huffman decoders / arithmetic conditioning at its SOS, so
between-scan DHT redefinitions (which our own progressive encoder emits for
every scan, reusing slots 0/1) cannot corrupt scans decoded in later waves.
"""

import numpy as np
import pytest

from libmodjpeg_tpu import constants as C
from libmodjpeg_tpu.codec import decode, encode
from libmodjpeg_tpu.encode_pixels import from_pixels

from util import make_gradient_pixels


@pytest.mark.parametrize("opts", [C.OPTION_PROGRESSIVE,
                                  C.OPTION_PROGRESSIVE | C.OPTION_ARITHMETRIC],
                         ids=["huffman", "arith"])
@pytest.mark.parametrize("subsampling", ["420", "444", "gray"])
def test_parallel_scan_decode_matches_serial(opts, subsampling):
    rng = np.random.RandomState(31)
    pix = make_gradient_pixels(rng, 264, 184)  # non-MCU-aligned dims
    img = from_pixels(pix, quality=88, subsampling=subsampling)
    data = encode(img, options=opts)
    serial = decode(data, nthreads=1)   # immediate in-order path
    for nt in (0, 2, 4, 7):
        par = decode(data, nthreads=nt)  # wave-scheduled path
        assert par.width == serial.width and par.height == serial.height
        for c in range(serial.num_components):
            np.testing.assert_array_equal(par.coefs[c], serial.coefs[c],
                                          err_msg=f"nt={nt} comp={c}")


def test_parallel_scan_decode_with_restarts():
    """Scan-level waves compose with restart-segmented parallelism inside
    single-scan stages."""
    rng = np.random.RandomState(32)
    pix = make_gradient_pixels(rng, 160, 120)
    img = from_pixels(pix, quality=85, subsampling="420")
    data = encode(img, options=C.OPTION_PROGRESSIVE, restart_interval=3)
    serial = decode(data, nthreads=1)
    par = decode(data, nthreads=4)
    for c in range(3):
        np.testing.assert_array_equal(par.coefs[c], serial.coefs[c])


def _dense_pixels(rng, w, h):
    """Noisy pixels -> dense AC scans, so the entropy payload crosses the
    256 KiB pipeline size gate at moderate dimensions."""
    return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("subsampling", ["420", "444"])
@pytest.mark.parametrize("restart", [0, 5], ids=["nori", "ri5"])
def test_pipelined_scan_decode_matches_serial(subsampling, restart):
    """The block-row-pipelined scheduler (conflicting scans decoding as a
    wavefront) is bit-identical to the serial in-order walk.  Dense noise
    pushes the file over the size gate so decode_scans_pipelined actually
    engages (a smooth test-size file would take the wave path)."""
    rng = np.random.RandomState(33)
    pix = _dense_pixels(rng, 712, 536)  # non-MCU-aligned dims
    img = from_pixels(pix, quality=95, subsampling=subsampling)
    data = encode(img, options=C.OPTION_PROGRESSIVE, restart_interval=restart)
    assert len(data) >= (256 << 10), len(data)  # gate actually crossed
    serial = decode(data, nthreads=1)
    for nt in (2, 3, 8):
        par = decode(data, nthreads=nt)
        for c in range(serial.num_components):
            np.testing.assert_array_equal(par.coefs[c], serial.coefs[c],
                                          err_msg=f"nt={nt} comp={c}")


def test_pipelined_scan_decode_truncated_stream():
    """Truncation is tolerated leniently (libjpeg-style: the bit reader pads
    out the missing tail); the pipelined scheduler must not hang and must
    produce exactly what the serial walk produces on the same bytes."""
    rng = np.random.RandomState(34)
    pix = _dense_pixels(rng, 712, 536)
    img = from_pixels(pix, quality=95, subsampling="420")
    data = encode(img, options=C.OPTION_PROGRESSIVE)
    assert len(data) >= (256 << 10)
    bad = data[:len(data) * 2 // 3]

    def try_decode(nt):
        try:
            return decode(bad, nthreads=nt)
        except Exception as e:
            return type(e).__name__

    serial = try_decode(1)
    par = try_decode(4)
    if isinstance(serial, str) or isinstance(par, str):
        assert serial == par  # both reject, same error class
    else:
        for c in range(serial.num_components):
            np.testing.assert_array_equal(par.coefs[c], serial.coefs[c])
