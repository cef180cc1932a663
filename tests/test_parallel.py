"""Sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4 strategy).

Numerical equality: sharded results must match the single-device compose /
effects exactly (they are the same integer math, just partitioned).
"""

import numpy as np
import pytest

import jax

import libmodjpeg_tpu as mj
from libmodjpeg_tpu.parallel import (
    BatchComposer,
    compose_batch,
    compose_sharded,
    effects_sharded,
    make_mesh,
)

from conftest import FIXTURE_IMAGES as IMAGES


@pytest.fixture(scope="module")
def base():
    return mj.read_jpeg(f"{IMAGES}/image.jpg")


@pytest.fixture(scope="module")
def logo():
    return mj.read_dropon(f"{IMAGES}/dropon.png")


def test_mesh_shapes():
    m = make_mesh()
    assert m.devices.size == len(jax.devices())
    m2 = make_mesh(batch=4, grid=2)
    assert m2.shape == {"batch": 4, "grid": 2}
    with pytest.raises(ValueError):
        make_mesh(batch=3, grid=3)


def test_batch_compose_matches_single(base, logo):
    """8 images batch-sharded over 8 devices == 8 single composes."""
    mesh = make_mesh()
    rng = np.random.RandomState(0)
    images = []
    for _ in range(8):
        im = base.copy()
        # perturb each image so the batch isn't degenerate
        for c in range(3):
            mask = rng.randint(0, 2, im.coefs[c].shape[:2])[..., None, None]
            im.coefs[c] = (im.coefs[c] + mask.astype(np.int16)).astype(np.int16)
        images.append(im)

    singles = [mj.compose(im, logo, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT, -5, -3)
               for im in images]
    batched = compose_batch(images, logo, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT,
                            -5, -3, mesh=mesh)
    for s, b in zip(singles, batched):
        for c in range(3):
            np.testing.assert_array_equal(s.coefs[c], b.coefs[c])


def test_batch_composer_reuse(base, logo):
    """A compiled BatchComposer applies to successive batches."""
    mesh = make_mesh()
    bc = BatchComposer(base, logo, mj.ALIGN_TOP | mj.ALIGN_LEFT, 7, 9,
                       mesh=mesh)
    single = mj.compose(base, logo, mj.ALIGN_TOP | mj.ALIGN_LEFT, 7, 9)
    for _ in range(2):
        batches = bc.put_batch([base] * 8)
        out = bc.compose_arrays(batches)
        host = [np.asarray(o) for o in out]
        for c in range(3):
            for i in range(8):
                np.testing.assert_array_equal(host[c][i], single.coefs[c])


def test_grid_sharded_effects_match(base):
    mesh = make_mesh(batch=2, grid=4)
    for name, single, kwargs in [
        ("grayscale", mj.effect_grayscale(base), {}),
        ("pixelate", mj.effect_pixelate(base), {}),
        ("tint", mj.effect_tint(base, 80, -40), {"cb_value": 80, "cr_value": -40}),
        ("luminance", mj.effect_luminance(base, 150), {"value": 150}),
    ]:
        sharded = effects_sharded(base, name, mesh, **kwargs)
        for c in range(3):
            np.testing.assert_array_equal(sharded.coefs[c], single.coefs[c],
                                          err_msg=f"{name} comp {c}")


def test_grid_sharded_compose_matches(base, logo):
    """Overlay straddling shard boundaries: GSPMD exchange must reproduce
    the single-device result bit-for-bit."""
    mesh = make_mesh(batch=1, grid=8)
    # center placement straddles row shards
    single = mj.compose(base, logo, mj.ALIGN_CENTER, 3, -7)
    sharded = compose_sharded(base, logo, mj.ALIGN_CENTER, 3, -7, mesh)
    for c in range(3):
        np.testing.assert_array_equal(sharded.coefs[c], single.coefs[c])


def test_from_pixels_roundtrip():
    """from_pixels -> entropy encode -> decode -> to_pixels is coherent."""
    from libmodjpeg_tpu import codec
    from libmodjpeg_tpu.encode_pixels import from_pixels
    from libmodjpeg_tpu.pixels import to_pixels

    rng = np.random.RandomState(3)
    yy, xx = np.mgrid[0:120, 0:200].astype(np.float32)
    smooth = np.stack([128 + 60 * np.sin(xx / 30), 128 + 50 * np.cos(yy / 25),
                       128 + 40 * np.sin((xx + yy) / 40)], axis=-1)
    pix = np.clip(smooth, 0, 255).astype(np.uint8)
    img = from_pixels(pix, quality=90, subsampling="420")
    data = codec.encode(img)
    back = codec.decode(data)
    out = to_pixels(back, mj.COLORSPACE_RGB)
    err = np.abs(out.astype(int) - pix.astype(int)).mean()
    assert err < 4.0, err
    # PIL agrees the file is valid and close
    import io
    from PIL import Image
    ppix = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.abs(ppix.astype(int) - pix.astype(int)).mean() < 4.0


def test_grid_session_chain(base, logo):
    """Device-resident chained pipeline == sequential host-side ops."""
    from libmodjpeg_tpu.parallel import GridSession

    mesh = make_mesh(batch=2, grid=4)
    sess = GridSession(base, mesh)
    sess.effect("luminance", value=77).effect("tint", cb_value=30, cr_value=-10)
    sess.compose(logo, mj.ALIGN_CENTER, -9, 4)
    sess.effect("pixelate")
    got = sess.to_image()

    want = mj.effect_luminance(base, 77)
    want = mj.effect_tint(want, 30, -10)
    want = mj.compose(want, logo, mj.ALIGN_CENTER, -9, 4)
    want = mj.effect_pixelate(want)
    for c in range(3):
        np.testing.assert_array_equal(got.coefs[c], want.coefs[c])


def test_init_distributed_noop():
    from libmodjpeg_tpu.parallel import init_distributed

    assert init_distributed() is False  # no coordinator configured


def test_watermark_stream_matches_serial(base, logo):
    """The 3-stage streaming pipeline yields, in order, exactly what the
    serial decode -> compose_images -> encode path produces."""
    from libmodjpeg_tpu import codec

    rng = np.random.RandomState(1)
    datas = []
    for _ in range(10):
        im = base.copy()
        for c in range(3):
            mask = rng.randint(0, 2, im.coefs[c].shape[:2])[..., None, None]
            im.coefs[c] = (im.coefs[c] + mask.astype(np.int16)).astype(np.int16)
        datas.append(codec.encode(im))

    bc = BatchComposer(base, logo, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT, -5, -3)
    expected = []
    for d in datas:
        im = codec.decode(d)
        bc.compose_images([im])
        expected.append(codec.encode(im, restart_interval=4))

    got = list(bc.watermark_stream(iter(datas), batch=3,
                                   restart_interval=4))
    assert got == expected


def test_watermark_stream_early_close(base, logo):
    """Abandoning the stream mid-run must not wedge (producer unblocks)."""
    from libmodjpeg_tpu import codec

    data = codec.encode(base)
    bc = BatchComposer(base, logo, mj.ALIGN_TOP | mj.ALIGN_LEFT)
    gen = bc.watermark_stream([data] * 12, batch=2, lookahead=1)
    first = next(gen)
    assert first[:2] == b"\xff\xd8"
    gen.close()  # must return promptly, not deadlock
