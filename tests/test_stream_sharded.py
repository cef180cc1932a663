"""Multi-chip streaming pipeline + mask-block classification tests.

Round-4 structural closure: the SHIPPED hot path (watermark_stream ->
_pack_regions -> packed compose) must drive every local chip, producing
output bit-identical to the single-device path (the compose is block-local,
so sharding the packed batch rows over the mesh changes nothing but where
the FLOPs run).  Likewise the static mask-block classification (zero /
DC-only / general) is a pure routing optimization: outputs must match the
all-general kernel bit for bit.
"""

import numpy as np
import pytest

import jax

import libmodjpeg_tpu as mj
from libmodjpeg_tpu import codec
from libmodjpeg_tpu.parallel import BatchComposer
from libmodjpeg_tpu.parallel.mesh import stream_mesh

from conftest import FIXTURE_IMAGES as IMAGES


@pytest.fixture(scope="module")
def base():
    return mj.read_jpeg(f"{IMAGES}/image.jpg")


@pytest.fixture(scope="module")
def logo():
    return mj.read_dropon(f"{IMAGES}/dropon.png")


@pytest.fixture(scope="module")
def datas():
    with open(f"{IMAGES}/image.jpg", "rb") as f:
        return [f.read()] * 13   # odd count: exercises batch-pad trimming


def test_stream_mesh_exists_on_virtual_devices():
    """The test env has 8 virtual CPU devices -> auto stream mesh."""
    m = stream_mesh()
    assert m is not None and m.shape["batch"] == len(jax.local_devices())


def test_streaming_path_sharded_and_bit_identical(base, logo, datas):
    """watermark_stream on the auto local-chip mesh == unsharded, byte for
    byte, with >=4-way device dispatch on the packed compose."""
    align = mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT
    bc = BatchComposer(base, logo, align, -5, -3)
    assert bc._stream_mesh is not None
    outs = list(bc.watermark_stream(iter(datas), batch=4))
    assert bc.last_dispatch_devices >= 4

    bc1 = BatchComposer(base, logo, align, -5, -3)
    bc1._stream_mesh = None   # force the single-device path
    outs1 = list(bc1.watermark_stream(iter(datas), batch=4))
    assert bc1.last_dispatch_devices == 1
    assert outs == outs1


def test_mask_classification_found_on_logo(base, logo):
    """The fixture logo mask has constant-alpha interior/padding: the
    classifier must find zero and DC-only blocks (the fast paths), not just
    general ones."""
    bc = BatchComposer(base, logo, mj.ALIGN_TOP | mj.ALIGN_LEFT, 8, 8)
    tot = [sum(x) for x in zip(*bc.mask_block_classes)]
    n_zero, n_dc, n_gen = tot
    assert n_dc + n_zero > 0, bc.mask_block_classes
    assert n_gen > 0   # the mask has edges somewhere


def test_zero_mask_blocks_untouched_through_stream(base, logo, datas):
    """Blocks whose mask is all-zero (transparent padding realizes sub-MCU
    placement) must come back bit-identical through the full streaming
    pipeline — the fused kernel's m=0 path is an exact pass-through."""
    align = mj.ALIGN_TOP | mj.ALIGN_LEFT
    bc = BatchComposer(base, logo, align, 3, 5)
    n_zero = sum(z for z, _, _ in bc.mask_block_classes)
    out = list(bc.watermark_stream(iter(datas[:1]), batch=1))[0]
    img_in = codec.decode(datas[0])
    img_out = codec.decode(out)
    origins = bc._region_origins()
    checked = 0
    for c, (r0, c0, h, w) in enumerate(origins):
        m = np.asarray(bc.cd.mask_pixels[c]).reshape(h * w, 64)
        zero = ~(m != 0).any(axis=1)
        a = img_in.coefs[c][r0:r0 + h, c0:c0 + w].reshape(h * w, 64)
        b = img_out.coefs[c][r0:r0 + h, c0:c0 + w].reshape(h * w, 64)
        np.testing.assert_array_equal(a[zero], b[zero],
                                      err_msg=f"component {c}")
        checked += int(zero.sum())
    # outside the footprint everything is untouched by construction; this
    # asserts the IN-footprint zero-mask blocks specifically
    assert checked == n_zero


def test_watermark_one_shot_caches_compiled_dropon(logo, monkeypatch):
    """Second watermark() call with the same (dropon, geometry, placement)
    must reuse the cached composer: no recompilation of the dropon."""
    import libmodjpeg_tpu.parallel.batch as pb

    data = open(f"{IMAGES}/image.jpg", "rb").read()
    mj._WATERMARK_CACHE.clear()
    inits = []
    orig = pb.BatchComposer.__init__

    def counting_init(self, *a, **kw):
        inits.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(pb.BatchComposer, "__init__", counting_init)
    out1 = mj.watermark(data, logo, mj.ALIGN_TOP | mj.ALIGN_LEFT, 4, 4)
    assert len(inits) == 1
    out2 = mj.watermark(data, logo, mj.ALIGN_TOP | mj.ALIGN_LEFT, 4, 4)
    assert len(inits) == 1          # cache hit: no new composer
    assert out1 == out2
    mj.watermark(data, logo, mj.ALIGN_TOP | mj.ALIGN_LEFT, 5, 4)
    assert len(inits) == 2          # different placement: new composer
    mj._WATERMARK_CACHE.clear()


def test_uniform_blend_dropon_all_dc(base):
    """A uniform-blend dropon (no mask edges at block granularity when the
    dropon is block-aligned and block-multiple) classifies with no general
    blocks at all on the luma plane interior."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (64, 32, 3), np.uint8)
    d = mj.read_dropon_from_raw(img.reshape(-1), mj.COLORSPACE_RGB, 32, 64,
                                blend=128)
    bc = BatchComposer(base, d, mj.ALIGN_TOP | mj.ALIGN_LEFT, 16, 16)
    n_zero, n_dc, n_gen = bc.mask_block_classes[0]
    assert n_gen == 0 and n_dc > 0
    data = open(f"{IMAGES}/image.jpg", "rb").read()
    out = list(bc.watermark_stream(iter([data]), batch=1))[0]
    img2 = codec.decode(out)
    assert img2.width == base.width


def test_wirepack_roundtrip_exact(base, logo, datas, monkeypatch):
    """The int8+exceptions uplink packing must be byte-exact end to end,
    including coefficients far outside int8 (forced via a high-contrast
    synthetic file), and must fall back to the raw wire when disabled."""
    import libmodjpeg_tpu.parallel.batch as pb

    align = mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT
    bc = BatchComposer(base, logo, align, -5, -3)
    outs = list(bc.watermark_stream(iter(datas), batch=4))
    monkeypatch.setenv("MJT_NO_WIREPACK", "1")
    bc2 = BatchComposer(base, logo, align, -5, -3)
    outs_raw = list(bc2.watermark_stream(iter(datas), batch=4))
    assert outs == outs_raw

    # unit: pack/unpack identity on adversarial values
    rng = np.random.RandomState(3)
    flat = rng.randint(-128, 128, (5, 256), np.int16)
    flat[0, 7] = -2047
    flat[0, 200] = 2047
    flat[3, :64] = 1000   # exception-dense row drives the capacity bucket
    lo, eidx, evals = pb._wirepack(flat)
    import jax.numpy as jnp

    n = lo.shape[0]
    rec = jnp.asarray(lo).astype(jnp.int16).at[
        jnp.arange(n)[:, None], jnp.asarray(eidx)].set(
        jnp.asarray(evals), mode="drop")
    np.testing.assert_array_equal(np.asarray(rec), flat)

    # degenerate: exception-heavy payload refuses to pack
    assert pb._wirepack(np.full((2, 64), 999, np.int16)) is None


def test_downlink_pack_roundtrip_exact(base, logo, datas, monkeypatch):
    """Round 5: the DOWNLINK int8+exceptions wire (device epilogue + host
    _downunpack) must be byte-exact end to end — stream outputs identical
    with the pack disabled — and the overflow fallback must engage when the
    capacity bucket is deliberately too small."""
    import libmodjpeg_tpu.parallel.batch as pb

    align = mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT
    bc = BatchComposer(base, logo, align, -5, -3)
    outs = list(bc.watermark_stream(iter(datas), batch=4))
    monkeypatch.setenv("MJT_NO_DOWNPACK", "1")
    bc2 = BatchComposer(base, logo, align, -5, -3)
    outs_raw = list(bc2.watermark_stream(iter(datas), batch=4))
    assert outs == outs_raw
    monkeypatch.delenv("MJT_NO_DOWNPACK")

    # overflow path: cap=1 cannot hold the real exception count, so rows
    # restore from the raw on-device output and the bucket widens — output
    # still byte-identical
    bc3 = BatchComposer(base, logo, align, -5, -3)
    bc3._down_cap = 1
    outs_small = list(bc3.watermark_stream(iter(datas), batch=4))
    assert outs_small == outs_raw
    # the fixture footprint has >1 exception per row, so cap=1 MUST have
    # overflowed and widened — proves the raw-restore fallback engaged
    assert bc3._down_cap > 1

    # unit: device pack -> host unpack identity on adversarial values
    import jax.numpy as jnp

    rng = np.random.RandomState(11)
    out_dev = rng.randint(-128, 128, (5, 256)).astype(np.int16)
    out_dev[0, 3] = -2047
    out_dev[2, 255] = 2047          # exception at the pad index sz-1
    out_dev[4, :10] = 300           # multi-exception row
    meta = (4,)                     # 4 blocks of 64 = 256
    fn = pb._packed_compose_fn(meta, None, False, 8)
    q = np.ones((5, 64), np.int32)
    drops = (np.zeros((4, 64), np.float32),)
    masks = (np.zeros((4, 64), np.float32),)   # zero mask: pass-through
    wire, raw = fn(out_dev, q, drops, masks)
    flat, counts = pb._downunpack(np.asarray(wire), 8)
    assert counts[4] == 10 and counts[1] == 0
    over = np.nonzero(counts > 8)[0]
    assert list(over) == [4]          # 10 exceptions overflow cap=8
    flat[over] = np.asarray(raw[np.asarray(over)])
    np.testing.assert_array_equal(flat, out_dev)   # pass-through + exact wire
