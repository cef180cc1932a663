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
