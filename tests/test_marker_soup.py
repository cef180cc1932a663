"""In-the-wild marker-soup robustness corpus.

Real JPEGs are rarely the clean SOI/APP0/DQT/SOF/DHT/SOS shape the codec's
own encoder emits: cameras write multi-segment EXIF/ICC APPn chains with
embedded JPEG thumbnails (nested SOI/EOI inside a length-delimited payload),
editors leave duplicate or re-defined DQT/DRI segments, muxers pad with
0xFF fill bytes, and broken writers leave junk between markers or truncate
the tail.  The reference documents its interop envelope across libjpeg
v6b-v9c / libjpeg-turbo / mozjpeg (/root/reference/README.md:166-175); this
corpus pins OUR parser to libjpeg's behavior on those shapes:

  * every synthesized file decodes bit-identically to libjpeg
    (.refbuild/dump_coefs differential), and
  * APPn/COM payloads survive a decode -> re-encode -> decode round trip
    byte-for-byte (including nested-thumbnail payloads), and the re-encoded
    file is still accepted by libjpeg.
"""

import io
import struct
import subprocess

import numpy as np
import pytest
from PIL import Image

from libmodjpeg_tpu.codec import decode, encode
from util import assert_matches_libjpeg, make_gradient_pixels


# ---------------------------------------------------------------------------
# synthesis helpers
# ---------------------------------------------------------------------------

def seg(marker: int, payload: bytes) -> bytes:
    """One marker segment with its 2-byte length."""
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def base_jpeg(rng, w=120, h=88, **save_kw) -> bytes:
    pix = make_gradient_pixels(rng, w, h)
    buf = io.BytesIO()
    Image.fromarray(pix, "RGB").save(buf, "JPEG", quality=85, **save_kw)
    return buf.getvalue()


def tiny_jpeg_thumbnail(rng) -> bytes:
    """A complete nested JPEG (SOI..EOI) to embed inside an APPn payload."""
    return base_jpeg(rng, w=24, h=16)


def find_sos(data: bytes) -> int:
    """Offset of the first SOS marker (0xFFDA)."""
    i = 2
    while i + 4 <= len(data):
        assert data[i] == 0xFF, "marker stream out of sync"
        while data[i + 1] == 0xFF:  # legal fill bytes before a marker
            i += 1
        m = data[i + 1]
        if m == 0xDA:
            return i
        ln = struct.unpack(">H", data[i + 2:i + 4])[0]
        i += 2 + ln
    raise AssertionError("no SOS found")


def insert_after_soi(data: bytes, extra: bytes) -> bytes:
    return data[:2] + extra + data[2:]


def insert_before_sos(data: bytes, extra: bytes) -> bytes:
    i = find_sos(data)
    return data[:i] + extra + data[i:]


def exif_app1(rng) -> bytes:
    """EXIF APP1 with a TIFF header and an embedded JPEG thumbnail whose
    SOI/EOI bytes sit INSIDE the length-delimited payload."""
    thumb = tiny_jpeg_thumbnail(rng)
    # minimal TIFF: II, IFD0 with one tag, then IFD1 pointing at the thumb
    tiff = b"II*\x00\x08\x00\x00\x00"
    ifd0 = struct.pack("<H", 1)
    ifd0 += struct.pack("<HHI4s", 0x0112, 3, 1, b"\x01\x00\x00\x00")
    next_ifd_off = 8 + 2 + 12 + 4
    ifd0 += struct.pack("<I", next_ifd_off)
    thumb_off = next_ifd_off + 2 + 2 * 12 + 4
    ifd1 = struct.pack("<H", 2)
    ifd1 += struct.pack("<HHII", 0x0201, 4, 1, thumb_off)       # JPEGIF offset
    ifd1 += struct.pack("<HHII", 0x0202, 4, 1, len(thumb))      # length
    ifd1 += struct.pack("<I", 0)
    return seg(0xFFE1, b"Exif\x00\x00" + tiff + ifd0 + ifd1 + thumb)


def icc_segments(rng, nseg=3, chunk=4000) -> bytes:
    """An ICC profile split across several APP2 segments (ICC v4 style)."""
    out = b""
    for i in range(nseg):
        payload = bytes(rng.randint(0, 256, chunk, dtype=np.uint8))
        out += seg(0xFFE2,
                   b"ICC_PROFILE\x00" + bytes([i + 1, nseg]) + payload)
    return out


DQT_SLOT3 = seg(0xFFDB, bytes([3]) + bytes(range(1, 65)))  # unused slot


def dri(val: int) -> bytes:
    return seg(0xFFDD, struct.pack(">H", val))


def soup_cases(rng):
    """(name, synthesized file) pairs.  Every file must remain decodable by
    libjpeg (verified in the test) — the soup never changes pixel meaning."""
    base = base_jpeg(rng)
    prog = base_jpeg(rng, progressive=True)
    rst = base_jpeg(rng, restart_marker_blocks=4)
    thumb = tiny_jpeg_thumbnail(rng)

    cases = [
        ("exif_thumbnail", insert_after_soi(base, exif_app1(rng))),
        ("icc_multiseg", insert_after_soi(base, icc_segments(rng))),
        ("xmp", insert_after_soi(
            base, seg(0xFFE1, b"http://ns.adobe.com/xap/1.0/\x00"
                      b"<x:xmpmeta xmlns:x='adobe:ns:meta/'/>" + b" " * 900))),
        ("many_appn", insert_after_soi(
            base, b"".join(seg(0xFFE3 + i, b"vendor%d" % i + bytes(40))
                           for i in range(12))
            + seg(0xFFFE, b"a comment") + seg(0xFFFE, b"another"))),
        ("jfxx_thumbnail", insert_after_soi(
            base, seg(0xFFE0, b"JFXX\x00\x10" + thumb))),
        ("empty_com_app", insert_after_soi(
            base, seg(0xFFFE, b"") + seg(0xFFE4, b""))),
        ("big_com", insert_after_soi(base, seg(0xFFFE, bytes(60000)))),
        ("dqt_unused_slot", insert_before_sos(base, DQT_SLOT3)),
        # a bogus early table the real (later) one must override
        ("dqt_redefined", insert_after_soi(
            base, seg(0xFFDB, bytes([0]) + bytes([99] * 64)))),
        ("dri_redefined", insert_after_soi(rst, dri(7))),
        ("dri_zero_then_real", insert_after_soi(rst, dri(0))),
        # 0xFF fill bytes are legal before any marker (T.81 B.1.1.2)
        ("fill_bytes", insert_before_sos(
            insert_after_soi(base, b"\xff" * 5), b"\xff" * 3)),
        ("junk_between_markers", insert_after_soi(
            base, seg(0xFFFE, b"x") + b"\x00\x12junk!bytes\x07")),
        ("trailing_garbage", base + b"\x00garbage after EOI\xff\x00"),
        ("double_eoi", base + b"\xff\xd9"),
        ("missing_eoi", base[:-2]),
        ("exif_plus_icc_prog", insert_after_soi(
            prog, exif_app1(rng) + icc_segments(rng, nseg=2, chunk=1500))),
        ("soup_on_restart", insert_after_soi(
            rst, exif_app1(rng) + seg(0xFFFE, b"restart soup"))),
        ("app15", insert_after_soi(base, seg(0xFFEF, b"APP15 payload"))),
        ("comment_before_sos", insert_before_sos(
            base, seg(0xFFFE, b"late comment"))),
        ("fill_and_junk_prog", insert_before_sos(
            insert_after_soi(prog, b"\xff" * 4 + seg(0xFFFE, b"p")),
            b"\xff\xff")),
        ("dht_before_dqt", None),  # filled below: reordered tables
    ]

    # reorder: move the first DHT segment to directly after SOI (tables may
    # appear in any order before the scan that uses them)
    i = 2
    dht = None
    while i + 4 <= len(base):
        m = base[i + 1]
        ln = struct.unpack(">H", base[i + 2:i + 4])[0]
        if m == 0xC4:
            dht = base[i:i + 2 + ln]
            reordered = base[:i] + base[i + 2 + ln:]
            break
        i += 2 + ln
    assert dht is not None
    cases[-1] = ("dht_before_dqt", insert_after_soi(reordered, dht))
    return cases


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_marker_soup_differential(ref_tools, tmp_path):
    """Every soup file decodes bit-identically to libjpeg."""
    _, dump = ref_tools
    rng = np.random.RandomState(1234)
    cases = soup_cases(rng)
    assert len(cases) >= 20
    for name, data in cases:
        p = tmp_path / f"{name}.jpg"
        p.write_bytes(data)
        out = subprocess.run([dump, str(p), str(p) + ".bin"],
                             capture_output=True)
        assert out.returncode == 0, (
            f"libjpeg rejected synthesized case {name}: "
            f"{out.stderr.decode()}")
        ours = decode(data)
        assert_matches_libjpeg(ours, dump, str(p))


def test_marker_soup_roundtrip(ref_tools, tmp_path):
    """APPn/COM payloads (nested thumbnails included) survive our
    decode -> re-encode -> decode byte-for-byte, and libjpeg accepts the
    re-encoded file."""
    _, dump = ref_tools
    rng = np.random.RandomState(1234)
    for name, data in soup_cases(rng):
        img = decode(data)
        markers_in = [(m, bytes(payload)) for m, payload in img.markers]
        out = encode(img)
        img2 = decode(out)
        markers_out = [(m, bytes(payload)) for m, payload in img2.markers]
        assert markers_out == markers_in, f"marker drift in {name}"
        p = tmp_path / f"{name}_re.jpg"
        p.write_bytes(out)
        r = subprocess.run([dump, str(p), str(p) + ".bin"],
                           capture_output=True)
        assert r.returncode == 0, (
            f"libjpeg rejected our re-encode of {name}: {r.stderr.decode()}")
