"""Speculative self-sync parallel decode (round 5).

Restart-free sequential scans above the size gate decode with the
stream split at the byte midpoint: a front decoder plus a speculative
back-half worker that re-rolls its MCU-phase assumption until it locks
(decoder.inc:decode_huff_selfsync).  The contract is strict bit-identity
with the serial walk — the speculation machinery (sync detection, DC
offset fixup, generation-gated copy, serial fallback) must never change
a single coefficient.
"""

import numpy as np
import pytest

from libmodjpeg_tpu import codec

from test_fuzz_roundtrip import random_image


def _assert_parallel_matches_serial(img, data):
    ser = codec.decode(data, nthreads=1)
    par = codec.decode(data)  # auto threads -> self-sync above the gate
    for c in range(len(img.components)):
        np.testing.assert_array_equal(ser.coefs[c], par.coefs[c],
                                      err_msg=f"component {c}")


@pytest.mark.parametrize("samp", ["420", "444", "422", "411", "gray"])
def test_selfsync_bit_identical(samp):
    """Large sequential restart-free files: parallel == serial, bit for
    bit, across samplings (interleaved MCU cycles of 6/3/4 blocks and the
    trivial single-component case)."""
    rng = np.random.RandomState(123)
    # 120x68 MCUs trips the >=1536-MCU / >=256KB self-sync gate
    img = random_image(rng, samp, 120, 68)
    data = codec.encode(img, 0)
    assert len(data) >= (256 << 10), "fixture must trip the size gate"
    _assert_parallel_matches_serial(img, data)


def test_selfsync_sparse_content():
    """Smooth content (tiny blocks, long zero runs) still syncs or falls
    back cleanly — output identical either way."""
    rng = np.random.RandomState(5)
    img = random_image(rng, "420", 120, 68)
    for c in range(3):
        # zero most AC coefficients: sparse entropy stream
        img.coefs[c][:, :, 2:, :] = 0
        img.coefs[c][:, :, :, 3:] = 0
    data = codec.encode(img, 0)
    if len(data) < (256 << 10):
        pytest.skip("stream too small to trip the self-sync gate")
    _assert_parallel_matches_serial(img, data)


def test_selfsync_corrupt_stream_errors_like_serial():
    """Corrupting entropy bytes must fail (or survive) identically in the
    parallel path — the generation-gated copy falls back to the front
    decoder's serial state on any cross-generation anomaly."""
    rng = np.random.RandomState(9)
    img = random_image(rng, "420", 120, 68)
    data = bytearray(codec.encode(img, 0))
    # stomp bytes deep in the second half (after the headers, inside the
    # back worker's territory)
    pos = len(data) * 3 // 4
    for i in range(64):
        data[pos + i] = 0x55
    blob = bytes(data)
    try:
        ser = codec.decode(blob, nthreads=1)
        ser_exc = None
    except Exception as e:  # noqa: BLE001 - comparing behavior classes
        ser, ser_exc = None, type(e)
    try:
        par = codec.decode(blob)
        par_exc = None
    except Exception as e:  # noqa: BLE001
        par, par_exc = None, type(e)
    assert ser_exc == par_exc
    if ser is not None and par is not None:
        for c in range(3):
            np.testing.assert_array_equal(ser.coefs[c], par.coefs[c])


def test_selfsync_12bit_precision():
    """12-bit sequential streams (wider DC/AC magnitude categories) must
    decode bit-identically through the speculative split."""
    rng = np.random.RandomState(21)
    img = random_image(rng, "420", 120, 68, precision=12)
    data = codec.encode(img, 0)
    if len(data) < (256 << 10):
        pytest.skip("stream too small to trip the self-sync gate")
    _assert_parallel_matches_serial(img, data)
