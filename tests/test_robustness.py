"""Decoder robustness: corrupt/truncated inputs must raise cleanly.

A production ingest codec sees malformed data; it must never crash the
process, hang, or read out of bounds — a typed DecodeError (or a successful
tolerant parse) are the only acceptable outcomes.
"""

import os

import numpy as np
import pytest

from libmodjpeg_tpu import codec
from libmodjpeg_tpu.codec import decode, encode
from libmodjpeg_tpu import constants as C
from libmodjpeg_tpu.errors import ModJpegError

from conftest import FIXTURE_IMAGES as IMAGES
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def samples():
    base = open(f"{IMAGES}/image.jpg", "rb").read()
    img = decode(base)
    return {
        "baseline": base,
        "progressive": encode(img, options=C.OPTION_PROGRESSIVE),
        "arithmetic": encode(img, options=C.OPTION_ARITHMETRIC),
        "restarts": encode(img, restart_interval=4),
    }


def _try(data):
    try:
        decode(data)
    except ModJpegError:
        pass  # clean failure is fine
    # tolerant success is also fine; crash/hang is not (enforced by pytest)


@pytest.mark.parametrize("kind", ["baseline", "progressive", "arithmetic",
                                  "restarts"])
def test_truncations(samples, kind):
    data = samples[kind]
    for frac in (0.02, 0.1, 0.3, 0.6, 0.9, 0.99):
        _try(data[: int(len(data) * frac)])


@pytest.mark.parametrize("kind", ["baseline", "progressive", "arithmetic"])
def test_byte_corruptions(samples, kind):
    data = bytearray(samples[kind])
    rng = np.random.RandomState(0)
    for _ in range(60):
        mut = bytearray(data)
        for _ in range(rng.randint(1, 6)):
            pos = rng.randint(0, len(mut))
            mut[pos] = rng.randint(0, 256)
        _try(bytes(mut))


def test_random_garbage():
    rng = np.random.RandomState(1)
    for n in (0, 1, 2, 3, 10, 1000):
        _try(bytes(rng.randint(0, 256, n, dtype=np.uint8)))
        _try(b"\xff\xd8" + bytes(rng.randint(0, 256, n, dtype=np.uint8)))


def test_oversubscribed_huffman_table(samples):
    """A DHT whose counts describe more codes than the bit-space holds used
    to overflow the decoder's lookup fill (found by the sanitizer fuzz
    harness, tools/fuzz_decode.cpp) — must be a clean error."""
    data = bytearray(samples["baseline"])
    i = data.find(b"\xff\xc4")
    assert i > 0
    data[i + 5] = 255  # counts[1] = 255: over-subscribed at length 1
    with pytest.raises(Exception):
        codec.decode(bytes(data))


def test_sanitizer_fuzz_harness(samples, tmp_path):
    """Build tools/fuzz_decode.cpp with ASan+UBSan and run a corruption fuzz
    round: any out-of-bounds access in the native codec fails the test."""
    import shutil
    import subprocess

    src = os.path.join(REPO, "tools", "fuzz_decode.cpp")
    binary = os.path.join("/tmp", "mjt_fuzz_decode_test")
    if (not os.path.exists(binary)
            or os.path.getmtime(binary) < os.path.getmtime(src)
            or os.path.getmtime(binary) < max(
                os.path.getmtime(os.path.join(
                    REPO, "libmodjpeg_tpu", "codec", "native", f))
                for f in ("codec.cpp", "decoder.inc", "arith.inc",
                          "encoder.inc", "api.inc"))):
        if shutil.which("g++") is None:
            pytest.skip("no g++")
        subprocess.run(
            ["g++", "-O1", "-g", "-fsanitize=address,undefined",
             "-fno-sanitize-recover=all", "-std=c++17", src, "-pthread",
             "-o", binary], check=True, capture_output=True)
    paths = []
    for kind, data in samples.items():
        p = tmp_path / f"{kind}.jpg"
        p.write_bytes(data)
        paths.append(str(p))
    # 800 (was 1500): every 5th iteration now fuzzes the ~24x-size
    # self-sync corpus entry the harness synthesizes, so per-iteration
    # cost grew; coverage per wall-second is higher than before
    r = subprocess.run([binary, "800", "42"] + paths,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "0 crashes" in r.stdout


def test_tsan_fuzz_smoke(samples, tmp_path):
    """Build the same harness with ThreadSanitizer and run a short round:
    the threaded decode paths (self-sync split, scan wave/pipeline,
    restart segments) must be race-free on hostile bytes.  Caught the
    round-5 disjoint-band-refinement mask-read race."""
    import shutil
    import subprocess

    src = os.path.join(REPO, "tools", "fuzz_decode.cpp")
    binary = os.path.join("/tmp", "mjt_fuzz_decode_tsan")
    if (not os.path.exists(binary)
            or os.path.getmtime(binary) < os.path.getmtime(src)
            or os.path.getmtime(binary) < max(
                os.path.getmtime(os.path.join(
                    REPO, "libmodjpeg_tpu", "codec", "native", f))
                for f in ("codec.cpp", "decoder.inc", "arith.inc",
                          "encoder.inc", "api.inc"))):
        if shutil.which("g++") is None:
            pytest.skip("no g++")
        subprocess.run(
            ["g++", "-O1", "-g", "-fsanitize=thread", "-std=c++17", src,
             "-pthread", "-o", binary], check=True, capture_output=True)
    paths = []
    for kind, data in samples.items():
        p = tmp_path / f"{kind}.jpg"
        p.write_bytes(data)
        paths.append(str(p))
    r = subprocess.run([binary, "40", "7"] + paths,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ThreadSanitizer" not in r.stderr, r.stderr[-2000:]
    assert "0 crashes" in r.stdout


def test_pathological_markers():
    # SOI + endless fill bytes
    _try(b"\xff\xd8" + b"\xff" * 5000)
    # zero-length-ish segments
    _try(b"\xff\xd8\xff\xdb\x00\x01")
    _try(b"\xff\xd8\xff\xc0\x00\x05\x08\x00\x00")
    # huge claimed dimensions with max_pixel guard off but no scan data
    _try(b"\xff\xd8\xff\xc0\x00\x11\x08\xff\xff\xff\xff\x03"
         b"\x01\x22\x00\x02\x11\x01\x03\x11\x01\xff\xd9")
