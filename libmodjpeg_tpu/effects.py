"""API-level effects on CoefImage (effect.c:28-222 parity).

Quirk preserved: grayscale/tint/luminance silently return the image
unchanged for non-YCbCr JPEGs instead of raising (effect.c:39-41,126-128,
195-197).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import constants as C
from .errors import NullDataError
from .model import CoefImage
from .ops import effects as fx


def _require(img: CoefImage) -> None:
    if img is None or not img.coefs:
        raise NullDataError("no image")


def _dc_clamp(img: CoefImage) -> int:
    """Dequantized-DC clamp range: ±2047 for 8-bit samples (the reference's
    hardcoded value, effect.c:149), ±32767 for 12-bit frames."""
    return (1 << (getattr(img, "precision", 8) + 3)) - 1


def grayscale(img: CoefImage) -> CoefImage:
    _require(img)
    if img.jpeg_color_space != C.JCS_YCbCr:
        return img.copy()
    out = img.copy()
    for c in range(1, out.num_components):
        out.coefs[c] = np.asarray(fx.zero_component(jnp.asarray(out.coefs[c])))
    return out


def pixelate(img: CoefImage) -> CoefImage:
    _require(img)
    out = img.copy()
    for c in range(out.num_components):
        out.coefs[c] = np.asarray(fx.zero_ac(jnp.asarray(out.coefs[c])))
    return out


def tint(img: CoefImage, cb_value: int, cr_value: int) -> CoefImage:
    _require(img)
    if img.jpeg_color_space != C.JCS_YCbCr:
        return img.copy()
    if cb_value == 0 and cr_value == 0:
        return img.copy()
    out = img.copy()
    clamp = _dc_clamp(img)
    if cb_value != 0 and out.num_components > 1:
        out.coefs[1] = np.asarray(fx.add_to_dc(
            jnp.asarray(out.coefs[1]), jnp.asarray(out.quant_table_for(1)),
            jnp.int32(cb_value), clamp))
    if cr_value != 0 and out.num_components > 2:
        out.coefs[2] = np.asarray(fx.add_to_dc(
            jnp.asarray(out.coefs[2]), jnp.asarray(out.quant_table_for(2)),
            jnp.int32(cr_value), clamp))
    return out


def luminance(img: CoefImage, value: int) -> CoefImage:
    _require(img)
    if img.jpeg_color_space != C.JCS_YCbCr:
        return img.copy()
    out = img.copy()
    out.coefs[0] = np.asarray(fx.add_to_dc(
        jnp.asarray(out.coefs[0]), jnp.asarray(out.quant_table_for(0)),
        jnp.int32(value), _dc_clamp(img)))
    return out
