"""Surgical splice watermarking (surgical.py): outputs must decode to EXACTLY
the same coefficients as the full decode->compose->encode pipeline, and all
untouched restart segments must be byte-identical to the input bitstream.

The reference has no counterpart (it always re-entropy-codes the whole file,
image.c:94,191-194); correctness here is defined against our own full path,
which is itself golden-tested against the reference binary (test_golden.py).
"""

import numpy as np
import pytest

import libmodjpeg_tpu as mj
from libmodjpeg_tpu import codec, surgical
from libmodjpeg_tpu.encode_pixels import from_pixels
from libmodjpeg_tpu.parallel.batch import BatchComposer


def make_jpeg(rng, w, h, subsampling, restart, quality=85, gray=False):
    if gray:
        pix = rng.randint(0, 255, (h, w), dtype=np.uint8)
    else:
        pix = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
    img = from_pixels(pix, quality=quality, subsampling=subsampling)
    return codec.encode(img, restart_interval=restart)


def run_both(data, align, ox, oy, n=2, logo_w=96, logo_h=40):
    rng = np.random.RandomState(7)
    logo = rng.randint(0, 255, (logo_h, logo_w, 4), dtype=np.uint8)
    dropon = mj.read_dropon_from_raw(logo, mj.COLORSPACE_RGBA, logo_w, logo_h)
    template = codec.decode(data)
    bc = BatchComposer(template, dropon, align, ox, oy)
    outs_s = list(bc.watermark_stream(iter([data] * n), batch=n))
    path_s = bc.last_stream_path
    outs_f = list(bc.watermark_stream(iter([data] * n), batch=n,
                                      surgical=False))
    return bc, outs_s, outs_f, path_s


def assert_equal_coefs(a_bytes, b_bytes):
    a, b = codec.decode(a_bytes), codec.decode(b_bytes)
    assert a.num_components == b.num_components
    for c in range(a.num_components):
        np.testing.assert_array_equal(a.coefs[c], b.coefs[c])


@pytest.mark.parametrize("subsampling,w,h,restart,align,ox,oy", [
    ("420", 640, 480, 13, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT, -17, -9),
    ("420", 637, 481, 7, mj.ALIGN_TOP | mj.ALIGN_LEFT, 3, 5),
    ("422", 320, 240, 5, 0, 0, 0),                      # centered
    ("444", 256, 256, 4, mj.ALIGN_BOTTOM | mj.ALIGN_LEFT, 1, -1),
    ("420", 512, 384, 32, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT, 0, 0),
])
def test_matches_full_path(subsampling, w, h, restart, align, ox, oy):
    rng = np.random.RandomState(1)
    data = make_jpeg(rng, w, h, subsampling, restart)
    bc, outs_s, outs_f, path = run_both(data, align, ox, oy)
    assert path == "surgical"
    for s, f in zip(outs_s, outs_f):
        assert_equal_coefs(s, f)


def test_untouched_segments_byte_identical():
    rng = np.random.RandomState(2)
    data = make_jpeg(rng, 640, 480, "420", 11)
    bc, outs_s, _, path = run_both(data, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT,
                                   -8, -8, n=1)
    assert path == "surgical"
    out = outs_s[0]
    plan = bc._surgical_plan()
    st_in = surgical.parse_structure(data)
    st_out = surgical.parse_structure(out)
    # header (everything before the entropy data) is the input's, verbatim
    assert out[:st_out.entropy_start] == data[:st_in.entropy_start]
    rin, ein = surgical.scan_entropy(data, st_in.entropy_start)
    rout, eout = surgical.scan_entropy(out, st_out.entropy_start)
    assert len(rin) == len(rout)
    starts_in = [st_in.entropy_start] + [p + 2 for p in rin]
    ends_in = rin + [ein]
    starts_out = [st_out.entropy_start] + [p + 2 for p in rout]
    ends_out = rout + [eout]
    touched = set(plan.segs)
    n_untouched = 0
    for i in range(len(starts_in)):
        if i not in touched:
            assert (data[starts_in[i]:ends_in[i]]
                    == out[starts_out[i]:ends_out[i]])
            n_untouched += 1
    assert n_untouched > 0


def test_grayscale():
    rng = np.random.RandomState(3)
    data = make_jpeg(rng, 400, 300, "444", 9, gray=True)
    bc, outs_s, outs_f, path = run_both(data, mj.ALIGN_TOP | mj.ALIGN_RIGHT,
                                        -5, 2)
    assert path == "surgical"
    assert_equal_coefs(outs_s[0], outs_f[0])


def test_short_final_segment_touched():
    # restart interval chosen so the file's last segment is partial and the
    # bottom-right footprint lands in it
    rng = np.random.RandomState(4)
    data = make_jpeg(rng, 320, 240, "420", 7)  # 300 MCUs -> last seg 6 MCUs
    bc, outs_s, outs_f, path = run_both(
        data, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT, 0, 0)
    assert path == "surgical"
    plan = bc._surgical_plan()
    assert plan.total_mcus % plan.R != 0
    assert plan.segs[-1] == plan.nsegs_file - 1
    assert_equal_coefs(outs_s[0], outs_f[0])


def test_chunked_windows(monkeypatch):
    # shrink the crafted-file width cap so the window spans several chunks
    monkeypatch.setattr(surgical, "_MAX_WIDTH", 24 * 16)
    rng = np.random.RandomState(5)
    data = make_jpeg(rng, 640, 480, "420", 10)
    bc, outs_s, outs_f, path = run_both(
        data, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT, -4, -4, logo_w=200)
    assert path == "surgical"
    assert len(bc._surgical_plan().chunks) > 1
    assert_equal_coefs(outs_s[0], outs_f[0])


def test_fallback_no_restarts():
    # No restart markers -> the surgical (restart-segmented) plan cannot
    # apply; since round 4 a centered footprint takes the restart-free
    # PREFIX SPLICE instead (byte-identical to full — tests/test_splice.py)
    rng = np.random.RandomState(6)
    data = make_jpeg(rng, 320, 240, "420", 0)
    bc, outs_s, outs_f, path = run_both(data, 0, 0, 0)
    assert path == "splice"
    assert_equal_coefs(outs_s[0], outs_f[0])


def test_fallback_progressive():
    rng = np.random.RandomState(8)
    pix = rng.randint(0, 255, (240, 320, 3), dtype=np.uint8)
    img = from_pixels(pix, quality=85, subsampling="420")
    data = codec.encode(img, options=mj.OPTION_PROGRESSIVE,
                        restart_interval=8)
    bc, outs_s, outs_f, path = run_both(data, 0, 0, 0)
    assert path == "full"
    assert_equal_coefs(outs_s[0], outs_f[0])


def test_fallback_when_options_requested():
    rng = np.random.RandomState(9)
    data = make_jpeg(rng, 320, 240, "420", 8)
    logo = rng.randint(0, 255, (40, 96, 4), dtype=np.uint8)
    dropon = mj.read_dropon_from_raw(logo, mj.COLORSPACE_RGBA, 96, 40)
    template = codec.decode(data)
    bc = BatchComposer(template, dropon, 0, 0, 0)
    list(bc.watermark_stream(iter([data]), batch=1,
                             options=mj.OPTION_OPTIMIZE))
    assert bc.last_stream_path == "full"


def test_mixed_batch_per_file_fallback():
    # One file in the batch lacks restarts: it alone takes the full path
    # while the eligible file stays surgical (per-file fallback), the
    # fallback is counted by reason, and both outputs still match the
    # forced-full pipeline.
    rng = np.random.RandomState(10)
    good = make_jpeg(rng, 320, 240, "420", 8)
    bad = make_jpeg(rng, 320, 240, "420", 0)
    logo = rng.randint(0, 255, (40, 96, 4), dtype=np.uint8)
    dropon = mj.read_dropon_from_raw(logo, mj.COLORSPACE_RGBA, 96, 40)
    template = codec.decode(good)
    bc = BatchComposer(template, dropon, 0, 0, 0)
    outs = list(bc.watermark_stream(iter([good, bad]), batch=2))
    assert bc.last_stream_path == "mixed"
    assert bc.last_fallback_reasons == {"restart-interval": 1}
    assert len(outs) == 2
    # surgical output keeps restart structure; full-path file matches full
    outs_f = list(bc.watermark_stream(iter([good, bad]), batch=2,
                                      surgical=False))
    for s, f in zip(outs, outs_f):
        assert_equal_coefs(s, f)


def test_own_quant_tables_stay_surgical():
    # A file whose quant tables differ from the template's is still in the
    # surgical envelope: the compose dequantizes with the FILE's own tables,
    # so the result matches the full pipeline on that same file.
    rng = np.random.RandomState(12)
    tpl_data = make_jpeg(rng, 320, 240, "420", 8, quality=85)
    other = make_jpeg(rng, 320, 240, "420", 8, quality=70)
    logo = rng.randint(0, 255, (40, 96, 4), dtype=np.uint8)
    dropon = mj.read_dropon_from_raw(logo, mj.COLORSPACE_RGBA, 96, 40)
    template = codec.decode(tpl_data)
    bc = BatchComposer(template, dropon, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT,
                       -4, -4)
    outs = list(bc.watermark_stream(iter([tpl_data, other]), batch=2))
    assert bc.last_stream_path == "surgical"
    assert bc.last_fallback_reasons == {}
    outs_f = list(bc.watermark_stream(iter([tpl_data, other]), batch=2,
                                      surgical=False))
    for s, f in zip(outs, outs_f):
        assert_equal_coefs(s, f)


def test_visual_footprint_confinement():
    """IDCT pixel check: the surgical output differs from the input only
    inside the overlay footprint (the reference's core quality claim,
    README.md:69-91)."""
    from libmodjpeg_tpu.pixels import to_pixels

    rng = np.random.RandomState(11)
    data = make_jpeg(rng, 320, 240, "420", 6)
    bc, outs_s, _, path = run_both(data, mj.ALIGN_TOP | mj.ALIGN_LEFT,
                                   32, 16, n=1)
    assert path == "surgical"
    before = to_pixels(codec.decode(data))
    after = to_pixels(codec.decode(outs_s[0]))
    diff = np.any(before != after, axis=-1)
    ys, xs = np.nonzero(diff)
    assert ys.size > 0
    # logo 96x40 placed at pixel (32,16): MCU-aligned, padded to the 16px
    # grid -> touched samples lie in x [32,128), y [16,64).  The pixel
    # oracle's fancy chroma upsampling interpolates a changed 4:2:0 chroma
    # sample into one neighboring luma pixel, so allow 2px of bleed.
    assert xs.min() >= 30 and xs.max() < 130
    assert ys.min() >= 14 and ys.max() < 66
