"""CMYK / YCCK (4-component Adobe) support.

Capability extension: the reference rejects anything but GRAY/RGB/YCbCr at
read (image.c:84-92).  Here 4-component frames decode/encode at the codec
layer, `read_jpeg(allow_cmyk=True)` admits them, `to_pixels` converts via
the Adobe inverted-ink convention, and compose/effects operate on all four
components (an RGB dropon maps exactly to C'M'Y' = RGB with K' = 255).
"""

import numpy as np
import pytest

import libmodjpeg_tpu as mj
from libmodjpeg_tpu import codec
from libmodjpeg_tpu import constants as C
from libmodjpeg_tpu.encode_pixels import _plane_to_quantized, quant_table, \
    _STD_LUMA
from libmodjpeg_tpu.errors import UnsupportedColorspaceError
from libmodjpeg_tpu.model import CoefImage, ComponentInfo, Sampling
from libmodjpeg_tpu.ops import dct as dctops
from libmodjpeg_tpu.pixels import to_pixels

import jax.numpy as jnp

from util import make_gradient_pixels


def _make_cmyk(rng, w=96, h=64, ycck=False, quality=92):
    """Synthesize a 4-component CoefImage with known pixel ground truth.

    C'M'Y' planes = an RGB gradient (Adobe inverted convention), K' a smooth
    near-255 plane -> ground-truth RGB = C'M'Y' * K'/255.
    """
    rgbish = make_gradient_pixels(rng, w, h).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    kplane = 235.0 + 20.0 * np.sin(xx / 37.0) * np.cos(yy / 29.0)
    if ycck:
        front = np.asarray(dctops.rgb_to_ycc(jnp.asarray(rgbish)))
        planes = [front[..., 0], front[..., 1], front[..., 2], kplane]
        jcs = C.JCS_YCCK
    else:
        planes = [rgbish[..., 0], rgbish[..., 1], rgbish[..., 2], kplane]
        jcs = C.JCS_CMYK
    qt = quant_table(_STD_LUMA, quality)
    q = jnp.asarray(qt.astype(np.int32))
    comps, coefs = [], []
    for c, p in enumerate(planes):
        blocks = np.asarray(_plane_to_quantized(jnp.asarray(p), q, 1, 1))
        comps.append(ComponentInfo(
            component_id=c + 1, h_samp=1, v_samp=1, quant_tbl_no=0,
            width_in_blocks=w // 8, height_in_blocks=h // 8,
            padded_width_in_blocks=w // 8, padded_height_in_blocks=h // 8))
        coefs.append(blocks)
    gt_rgb = np.clip(rgbish, 0, 255) * np.clip(kplane, 0, 255)[..., None] / 255.0
    return CoefImage(width=w, height=h, jpeg_color_space=jcs,
                     components=comps, coefs=coefs, quant_tables={0: qt},
                     sampling=Sampling(1, 1)), gt_rgb


@pytest.mark.parametrize("ycck", [False, True], ids=["cmyk", "ycck"])
def test_codec_roundtrip_and_adobe_marker(ycck):
    rng = np.random.RandomState(20)
    img, _ = _make_cmyk(rng, ycck=ycck)
    data = codec.encode(img, options=1)
    back = codec.decode(data)
    assert back.num_components == 4
    assert back.jpeg_color_space == img.jpeg_color_space  # from Adobe APP14
    for c in range(4):
        np.testing.assert_array_equal(back.coefs[c], img.coefs[c])


def test_read_jpeg_guard_and_optin(tmp_path):
    rng = np.random.RandomState(21)
    img, _ = _make_cmyk(rng)
    p = tmp_path / "cmyk.jpg"
    p.write_bytes(codec.encode(img))
    with pytest.raises(UnsupportedColorspaceError):
        mj.read_jpeg(str(p))  # reference-parity default
    back = mj.read_jpeg(str(p), allow_cmyk=True)
    assert back.jpeg_color_space == C.JCS_CMYK


@pytest.mark.parametrize("ycck", [False, True], ids=["cmyk", "ycck"])
def test_to_pixels_inverted_ink(ycck):
    rng = np.random.RandomState(22)
    img, gt_rgb = _make_cmyk(rng, ycck=ycck)
    out = to_pixels(img, C.COLORSPACE_RGB).astype(np.float64)
    err = np.abs(out - gt_rgb)
    assert err.mean() < 4.0 and err.max() < 50.0


@pytest.mark.parametrize("ycck", [False, True], ids=["cmyk", "ycck"])
def test_compose_on_cmyk(ycck):
    rng = np.random.RandomState(23)
    img, _ = _make_cmyk(rng, ycck=ycck)

    logo = np.zeros((16, 24, 4), dtype=np.uint8)
    logo[..., 0] = 200   # R
    logo[..., 1] = 40    # G
    logo[..., 2] = 160   # B
    logo[..., 3] = 255   # fully opaque
    d = mj.read_dropon_from_raw(logo, mj.COLORSPACE_RGBA, 24, 16)

    out = mj.compose(img, d, mj.ALIGN_TOP | mj.ALIGN_LEFT, 8, 8)

    # untouched blocks bit-exact on all four components
    for c in range(4):
        mask = np.ones(out.coefs[c].shape[:2], bool)
        mask[1:3, 1:4] = False  # 8..32 x 8..24 px -> blocks (1..2, 1..3)
        np.testing.assert_array_equal(out.coefs[c][mask], img.coefs[c][mask])
        assert not np.array_equal(out.coefs[c][~mask], img.coefs[c][~mask])

    # footprint interior renders the dropon's RGB color (opaque alpha)
    pix = to_pixels(out, C.COLORSPACE_RGB).astype(np.float64)
    interior = pix[10:22, 10:30]
    target = np.array([200.0, 40.0, 160.0])
    assert np.abs(interior - target).mean() < 6.0


def test_cli_allow_cmyk_flag(tmp_path):
    from libmodjpeg_tpu.cli import main as cli_main

    rng = np.random.RandomState(25)
    img, _ = _make_cmyk(rng)
    src = tmp_path / "cmyk.jpg"
    src.write_bytes(codec.encode(img))
    out = tmp_path / "out.jpg"
    # without -C the reference-parity guard rejects the input
    assert cli_main(["-i", str(src), "-o", str(out)]) == 1
    # with -C (before -i, order-dependent) it processes end to end
    assert cli_main(["-C", "-i", str(src), "-x", "-o", str(out)]) == 0
    back = mj.read_jpeg(out.read_bytes(), allow_cmyk=True)
    assert back.num_components == 4
    assert not back.coefs[0].reshape(-1, 64)[:, 1:].any()


def test_pixelate_four_components():
    rng = np.random.RandomState(24)
    img, _ = _make_cmyk(rng)
    out = mj.effect_pixelate(img)
    for c in range(4):
        ac = out.coefs[c].reshape(-1, 64)[:, 1:]
        assert not ac.any()
        np.testing.assert_array_equal(out.coefs[c][..., 0, 0],
                                      img.coefs[c][..., 0, 0])
