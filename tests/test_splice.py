"""Restart-free prefix-splice path (codec.decode_tail / codec.encode_splice).

The splice invariant: re-encoding an untouched MCU with the same
coefficients, Huffman tables, and DC predictors reproduces its original
bits EXACTLY, so a watermark whose footprint starts at MCU row R can
byte-copy the original file up to R's bit position and re-encode only
rows >= R — the output must be BYTE-IDENTICAL to the full
decode-everything / re-encode-everything path.  This is the restart-free
analog of the surgical splice (surgical.py), covering the dominant
real-world shape (no restart markers) the round-3 verdict called out.
"""

import io

import numpy as np
import pytest

import libmodjpeg_tpu as mj
from libmodjpeg_tpu import codec
from libmodjpeg_tpu.parallel import BatchComposer

from util import encode_pil


def _noisy(rng, w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = 128 + 90 * np.sin(xx / 29.0) * np.cos(yy / 41.0)
    return np.clip(smooth[..., None] + rng.normal(0, 14, (h, w, 3)), 0,
                   255).astype(np.uint8)


@pytest.mark.parametrize("mode,sub", [("RGB", "420"), ("RGB", "444"),
                                      ("RGB", "422"), ("L", None)])
def test_splice_reencode_identical_to_full(mode, sub):
    """Unmodified round trip: splice == full re-encode, byte for byte, and
    the prefix equals the original file's bytes."""
    rng = np.random.default_rng(3)
    pix = _noisy(rng, 408, 312)   # odd-ish dims: partial right/bottom MCUs
    data = encode_pil(pix, mode=mode, quality=88, subsampling=sub)
    full = codec.decode(data)
    rows = full.components[0].padded_height_in_blocks \
        // full.sampling.max_v_samp
    for row in (0, 1, rows // 2, rows - 1, rows):
        img, splice = codec.decode_tail(data, row)
        v = full.sampling.max_v_samp
        for c in range(len(full.coefs)):
            vc = full.components[c].v_samp
            r0 = row * vc
            np.testing.assert_array_equal(img.coefs[c][r0:],
                                          full.coefs[c][r0:])
        out = codec.encode_splice(data, img, row, splice)
        assert out == codec.encode(full), f"row {row}"
        assert out[:splice[0]] == data[:splice[0]]


def test_splice_with_modified_tail_matches_full_path():
    """Modify coefficients in the tail (what compose does) — splice output
    must equal the full path's output byte for byte."""
    rng = np.random.default_rng(5)
    data = encode_pil(_noisy(rng, 320, 240), quality=85, subsampling="420")
    full = codec.decode(data)
    rows = full.components[0].padded_height_in_blocks // 2
    row = rows - 3
    img, splice = codec.decode_tail(data, row)
    for c in range(3):
        vc = full.components[c].v_samp
        r0 = row * vc
        full.coefs[c][r0 + 1, 2:5, 0, 0] += 7
        img.coefs[c][r0 + 1, 2:5, 0, 0] += 7
    assert codec.encode_splice(data, img, row, splice) == codec.encode(full)


def test_splice_ineligible_shapes():
    rng = np.random.default_rng(7)
    pix = _noisy(rng, 160, 160)
    prog = encode_pil(pix, quality=85, progressive=True)
    with pytest.raises(codec.SpliceIneligible):
        codec.decode_tail(prog, 2)
    rst = codec.encode(codec.decode(encode_pil(pix, quality=85)),
                       restart_interval=4)
    with pytest.raises(codec.SpliceIneligible):
        codec.decode_tail(rst, 2)
    from libmodjpeg_tpu import constants as C

    arith = codec.encode(codec.decode(encode_pil(pix, quality=85)),
                         options=C.OPTION_ARITHMETIC)
    with pytest.raises(codec.SpliceIneligible):
        codec.decode_tail(arith, 2)
    trunc = encode_pil(pix, quality=85)[:-2]  # missing EOI
    with pytest.raises(codec.SpliceIneligible):
        codec.decode_tail(trunc, 2)


def test_splice_12bit():
    from libmodjpeg_tpu.encode_pixels import from_pixels

    rng = np.random.default_rng(9)
    img = from_pixels(_noisy(rng, 256, 192), quality=90, subsampling="420")
    for c in range(len(img.coefs)):
        img.coefs[c] = (img.coefs[c].astype(np.int32) * 3).clip(
            -2047, 2047).astype(np.int16)
    img.precision = 12
    data = codec.encode(img)
    full = codec.decode(data)
    tail, splice = codec.decode_tail(data, 5)
    assert codec.encode_splice(data, tail, 5, splice) == codec.encode(full)


def test_stream_splice_path_byte_identical(tmp_path):
    """watermark_stream takes the splice path for a bottom-placed logo on a
    restart-free corpus and yields the SAME bytes as the forced full path;
    an ineligible (progressive) file in the batch falls back per file."""
    rng = np.random.default_rng(11)
    datas = [encode_pil(_noisy(rng, 256, 208), quality=85,
                        subsampling="420") for _ in range(5)]
    base = codec.decode(datas[0])
    logo = np.zeros((24, 64, 4), np.uint8)
    logo[..., :3] = 200
    logo[4:-4, 4:-4, 3] = 255
    d = mj.read_dropon_from_raw(logo, mj.COLORSPACE_RGBA, 64, 24)

    bc = BatchComposer(base, d, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT, -8, -8)
    outs = list(bc.watermark_stream(iter(datas), batch=3))
    assert bc.last_stream_path == "splice", bc.last_stream_path

    bc_full = BatchComposer(base, d, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT, -8, -8)
    outs_full = list(bc_full.watermark_stream(iter(datas), batch=3,
                                              surgical=False))
    assert bc_full.last_stream_path == "full"
    assert outs == outs_full

    # mixed batch: a progressive file falls back to the full path per file
    mixed = datas[:2] + [encode_pil(_noisy(rng, 256, 208), quality=85,
                                    subsampling="420", progressive=True)]
    bc2 = BatchComposer(base, d, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT, -8, -8)
    outs2 = list(bc2.watermark_stream(iter(mixed), batch=3))
    assert bc2.last_stream_path == "mixed"
    assert sum(bc2.last_fallback_reasons.values()) == 1
    bc3 = BatchComposer(base, d, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT, -8, -8)
    outs3 = list(bc3.watermark_stream(iter(mixed), batch=3, surgical=False))
    assert outs2 == outs3


def test_stream_top_placement_band_splices():
    """Round 5: block_y == 0 no longer forces the full path — the BAND
    splice decodes only the footprint rows and bit-shift-copies the
    suffix; output must equal the forced full pipeline byte for byte."""
    rng = np.random.default_rng(13)
    datas = [encode_pil(_noisy(rng, 256, 208), quality=85,
                        subsampling="420")] * 3
    base = codec.decode(datas[0])
    logo = np.full((24, 64, 4), 180, np.uint8)
    d = mj.read_dropon_from_raw(logo, mj.COLORSPACE_RGBA, 64, 24)
    bc = BatchComposer(base, d, mj.ALIGN_TOP | mj.ALIGN_LEFT, 0, 0)
    outs = list(bc.watermark_stream(iter(datas), batch=3))
    assert bc.last_stream_path == "splice"
    bc2 = BatchComposer(base, d, mj.ALIGN_TOP | mj.ALIGN_LEFT, 0, 0)
    outs_full = list(bc2.watermark_stream(iter(datas), batch=3,
                                          surgical=False))
    assert bc2.last_stream_path == "full"
    assert outs == outs_full


def test_stream_center_placement_band_splices():
    """A centered logo (prefix AND suffix) band-splices; bytes equal the
    full pipeline."""
    rng = np.random.default_rng(14)
    datas = [encode_pil(_noisy(rng, 256, 208), quality=85,
                        subsampling="420")] * 3
    base = codec.decode(datas[0])
    logo = np.full((24, 64, 4), 180, np.uint8)
    d = mj.read_dropon_from_raw(logo, mj.COLORSPACE_RGBA, 64, 24)
    bc = BatchComposer(base, d, mj.ALIGN_CENTER, 3, 5)
    outs = list(bc.watermark_stream(iter(datas), batch=3))
    assert bc.last_stream_path == "splice"
    bc2 = BatchComposer(base, d, mj.ALIGN_CENTER, 3, 5)
    outs_full = list(bc2.watermark_stream(iter(datas), batch=3,
                                          surgical=False))
    assert outs == outs_full


@pytest.mark.parametrize("band", [(0, 4), (5, 9), (20, 26), (0, 26),
                                  (12, 13)],
                         ids=["top", "near-top", "bottom", "whole",
                              "one-row"])
def test_band_splice_byte_identical(band):
    """codec.decode_band / encode_splice_band: decode only MCU rows
    [r0, r1), edit inside the band (including a DC change — the suffix
    seam's first MCU must re-code against the new predictor chain), and
    the spliced re-encode must equal the full decode->edit->encode
    pipeline byte for byte."""
    r0, r1 = band
    rng = np.random.default_rng(99)
    data = encode_pil(_noisy(rng, 320, 416), quality=85, subsampling="420")
    full = codec.decode(data)
    rows_total = (416 + 15) // 16
    r1 = min(r1, rows_total)

    img, sp = codec.decode_band(data, r0, r1)
    for c in range(3):
        v = full.components[c].v_samp
        np.testing.assert_array_equal(img.coefs[c][r0 * v:r1 * v],
                                      full.coefs[c][r0 * v:r1 * v])

    mod = codec.decode(data)
    rr = r0 * 2
    for tgt in (img, mod):
        tgt.coefs[0][rr, 3, 0, 1] += 5
        tgt.coefs[0][min(rr + 1, r1 * 2 - 1), 7, 0, 0] += 2  # DC: seam fix
    out_band = codec.encode_splice_band(data, img, r0, r1, sp)
    out_full = codec.encode(mod)
    assert out_band == out_full


def test_band_splice_unmodified_reproduces_original():
    """With no edits at all, the band splice must reproduce the ORIGINAL
    file byte for byte (prefix copy + deterministic band re-encode + seam
    re-code + suffix bit copy)."""
    rng = np.random.default_rng(7)
    data = encode_pil(_noisy(rng, 256, 208), quality=85, subsampling="420")
    img, sp = codec.decode_band(data, 3, 7)
    assert codec.encode_splice_band(data, img, 3, 7, sp) == data


def test_band_splice_optimized_tables_fallback():
    """A file with OPTIMIZED Huffman tables may lack a code for a symbol
    the composed band newly needs (the splice must keep the original
    tables for bit-identity).  Such files fall back to the full path PER
    FILE; output equals the forced full pipeline either way.  (Latent
    since the round-4 prefix splice; found in round 5 on the reference
    fixture, whose tables are optimized.)"""
    rng = np.random.default_rng(17)
    # smooth content -> sparse optimized tables; a noisy opaque logo then
    # needs symbols the tables never saw
    yy, xx = np.mgrid[0:208, 0:256]
    smooth = np.clip(128 + 60 * np.sin(xx / 53.0) * np.cos(yy / 67.0), 0,
                     255).astype(np.uint8)
    pix = np.repeat(smooth[..., None], 3, axis=2)
    from libmodjpeg_tpu import constants as C
    from libmodjpeg_tpu.encode_pixels import from_pixels

    data = codec.encode(from_pixels(pix, quality=85, subsampling="420"),
                        options=C.OPTION_OPTIMIZE)
    base = codec.decode(data)
    logo = rng.integers(0, 255, (24, 64, 4), dtype=np.uint8)
    logo[..., 3] = 255
    d = mj.read_dropon_from_raw(np.ascontiguousarray(logo),
                                mj.COLORSPACE_RGBA, 64, 24)
    bc = BatchComposer(base, d, mj.ALIGN_TOP | mj.ALIGN_LEFT, 8, 8)
    outs = list(bc.watermark_stream(iter([data] * 3), batch=3))
    bc2 = BatchComposer(base, d, mj.ALIGN_TOP | mj.ALIGN_LEFT, 8, 8)
    outs_full = list(bc2.watermark_stream(iter([data] * 3), batch=3,
                                          surgical=False))
    assert outs == outs_full
    # the fallback is per file and counted when it fires
    if bc.last_stream_path == "mixed":
        assert any("tables lack" in k for k in bc.last_fallback_reasons)


def test_surgical_optimized_tables_fallback():
    """The surgical (restart-segmented) splice re-encodes touched segments
    with the file's own tables — optimized tables can lack a symbol the
    composed segment needs; the file must fall back to the full path and
    produce the forced-full output."""
    rng = np.random.default_rng(23)
    yy, xx = np.mgrid[0:208, 0:256]
    smooth = np.clip(128 + 60 * np.sin(xx / 53.0) * np.cos(yy / 67.0), 0,
                     255).astype(np.uint8)
    pix = np.repeat(smooth[..., None], 3, axis=2)
    from libmodjpeg_tpu import constants as C
    from libmodjpeg_tpu.encode_pixels import from_pixels

    data = codec.encode(from_pixels(pix, quality=85, subsampling="420"),
                        options=C.OPTION_OPTIMIZE, restart_interval=4)
    base = codec.decode(data)
    logo = rng.integers(0, 255, (24, 64, 4), dtype=np.uint8)
    logo[..., 3] = 255
    d = mj.read_dropon_from_raw(np.ascontiguousarray(logo),
                                mj.COLORSPACE_RGBA, 64, 24)
    bc = BatchComposer(base, d, mj.ALIGN_TOP | mj.ALIGN_LEFT, 8, 8)
    outs = list(bc.watermark_stream(iter([data] * 2), batch=2,
                                    restart_interval=4))
    bc2 = BatchComposer(base, d, mj.ALIGN_TOP | mj.ALIGN_LEFT, 8, 8)
    outs_full = list(bc2.watermark_stream(iter([data] * 2), batch=2,
                                          restart_interval=4,
                                          surgical=False))
    assert outs == outs_full
    if bc.last_stream_path == "mixed":
        assert any("tables lack" in k for k in bc.last_fallback_reasons)


@pytest.mark.parametrize("mode,sub", [("RGB", "444"), ("RGB", "422"),
                                      ("L", None)])
def test_band_splice_other_samplings(mode, sub):
    """Band splice across 4:4:4 / 4:2:2 / grayscale geometries (MCU-row
    math differs per sampling): unmodified reproduces the original;
    modified equals the full pipeline."""
    rng = np.random.default_rng(41)
    data = encode_pil(_noisy(rng, 320, 416), mode=mode, quality=86,
                      subsampling=sub)
    full = codec.decode(data)
    img, sp = codec.decode_band(data, 6, 14)
    assert codec.encode_splice_band(data, img, 6, 14, sp) == data
    nc = len(full.coefs)
    v = full.components[0].v_samp
    mod = codec.decode(data)
    for tgt in (img, mod):
        tgt.coefs[0][6 * v, 2, 0, 0] += 3
    assert codec.encode_splice_band(data, img, 6, 14, sp) == \
        codec.encode(mod)
    assert nc in (1, 3)


def test_band_splice_12bit_unmodified():
    """12-bit sequential (optimized tables forced): an unmodified band
    splice must still reproduce the original byte for byte (all copied
    symbols exist in the original tables by construction)."""
    from libmodjpeg_tpu.encode_pixels import from_pixels

    rng = np.random.default_rng(43)
    img = from_pixels(_noisy(rng, 256, 320), quality=90, subsampling="420")
    for c in range(len(img.coefs)):
        img.coefs[c] = (img.coefs[c].astype(np.int32) * 3).clip(
            -2047, 2047).astype(np.int16)
    img.precision = 12
    data = codec.encode(img)
    band, sp = codec.decode_band(data, 4, 12)
    assert codec.encode_splice_band(data, band, 4, 12, sp) == data
