"""Compose driver: placement, dropon compilation, masked blend dispatch.

Behavioral mirror of compose.c:33-180 (placement/crop/block-offset math,
including its edge-case quirks) and dropon.c:325-428 (dropon compilation) —
but the compilation computes the dropon's subsampled DCT directly on device
(color convert -> box subsample -> batched FDCT -> round; Q100 quant tables
are all ones so "quantize" is rounding) instead of the reference's
re-encode-through-libjpeg trick, and the blend runs as batched matmuls
(ops/compose.py) instead of scalar convolution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .errors import NullDataError, UnsupportedColorspaceError
from .model import CoefImage, CompiledDropon, Dropon
from .ops import dct as dctops

import dataclasses


@dataclasses.dataclass
class Placement:
    """Resolved placement of a dropon on an image (compose.c:57-172)."""

    noop: bool
    crop_x: int = 0
    crop_y: int = 0
    crop_w: int = 0
    crop_h: int = 0
    blockoffset_x: int = 0
    blockoffset_y: int = 0
    block_x: int = 0
    block_y: int = 0
    position_x: int = 0
    position_y: int = 0


def plan_placement(img: CoefImage, d: Dropon, align: int, offset_x: int,
                   offset_y: int) -> Placement:
    """Placement/crop/block-offset math, mirroring compose.c:57-172 with its
    edge-case quirks (C-style truncation, negative clamping)."""
    if d.blend == C.BLEND_NONE:
        return Placement(noop=True)

    if align & C.ALIGN_LEFT:
        px = 0
    elif align & C.ALIGN_RIGHT:
        px = img.width - d.width
    else:
        px = img.width // 2 - d.width // 2
    px += offset_x
    if align & C.ALIGN_TOP:
        py = 0
    elif align & C.ALIGN_BOTTOM:
        py = img.height - d.height
    else:
        py = img.height // 2 - d.height // 2
    py += offset_y

    crop_x = -px if px < 0 else 0
    crop_w = d.width - crop_x
    if crop_x > d.width or px > img.width:
        crop_w = 0
    elif px + crop_x + crop_w > img.width:
        crop_w = img.width - crop_x - px
    crop_y = -py if py < 0 else 0
    crop_h = d.height - crop_y
    if crop_y > d.height or py > img.height:
        crop_h = 0
    elif py + crop_y + crop_h > img.height:
        crop_h = img.height - crop_y - py

    if crop_w <= 0 or crop_h <= 0:
        return Placement(noop=True)

    return Placement(
        noop=False, crop_x=crop_x, crop_y=crop_y, crop_w=crop_w,
        crop_h=crop_h,
        blockoffset_x=px % img.sampling.h_factor if px >= 0 else 0,
        blockoffset_y=py % img.sampling.v_factor if py >= 0 else 0,
        block_x=max(0, int(np.trunc(px / img.sampling.h_factor))),
        block_y=max(0, int(np.trunc(py / img.sampling.v_factor))),
        position_x=px, position_y=py)


# mask-DCT normalization factors (dropon.c:544-566)
_ALPHA_FACTORS = np.full((8, 8), 0.25 / 1020.0, dtype=np.float32)
_ALPHA_FACTORS[0, :] = 0.3535534 * 0.5 / 1020.0
_ALPHA_FACTORS[:, 0] = 0.5 * 0.3535534 / 1020.0
_ALPHA_FACTORS[0, 0] = 0.3535534 * 0.3535534 / 1020.0


@functools.partial(jax.jit, static_argnums=(1, 2))
def _plane_to_dct_blocks(plane: jax.Array, fh: int, fv: int) -> jax.Array:
    """[H, W] float plane -> [H/(8fh? ) ...] rounded Q100 DCT blocks after
    box subsampling by (fh, fv)."""
    sub = dctops.subsample_plane(plane, fh, fv)
    blocks = dctops.tile_blocks(sub)
    return jnp.rint(dctops.fdct_blocks(blocks))


@functools.partial(jax.jit, static_argnums=(1, 2))
def _alpha_to_weights(plane: jax.Array, fh: int, fv: int) -> jax.Array:
    """Alpha plane -> normalized convolution weights w' (dropon.c:497-576):
    Q100 DCT, DC+1024 level-shift undo, scale by c(i)c(j)/1020."""
    d = _plane_to_dct_blocks(plane, fh, fv)
    d = d.at[..., 0, 0].add(1024.0)
    return d * jnp.asarray(_ALPHA_FACTORS)


def _convert_canvas(canvas: np.ndarray, src_cs: int, jpeg_cs: int) -> list:
    """3-channel canvas in src colorspace -> list of target-space planes.

    CMYK/YCCK targets (beyond the reference, which rejects 4-component
    JPEGs — image.c:84-92): Adobe stores CMYK inverted (sample 255 = no
    ink), so an RGB dropon maps exactly to (C',M',Y') = (R,G,B) with a
    constant K' = 255 plane; YCCK applies the YCC transform on top.  The
    masked blend then composites all four components, pulling K' toward
    "no black ink" inside the footprint."""
    cf = jnp.asarray(canvas, jnp.float32)
    if jpeg_cs in (C.JCS_CMYK, C.JCS_YCCK):
        if src_cs == C.COLORSPACE_YCC:
            rgb = dctops.ycc_to_rgb(cf)
        elif src_cs in (C.COLORSPACE_RGB, C.COLORSPACE_GRAYSCALE):
            rgb = cf
        else:
            raise UnsupportedColorspaceError(str(src_cs))
        if jpeg_cs == C.JCS_YCCK:
            out = dctops.rgb_to_ycc(rgb)
        else:
            out = rgb
        k = jnp.full_like(cf[..., 0], 255.0)
        return [out[..., 0], out[..., 1], out[..., 2], k]
    if jpeg_cs == C.JCS_YCbCr:
        if src_cs == C.COLORSPACE_RGB:
            out = dctops.rgb_to_ycc(cf)
        elif src_cs == C.COLORSPACE_YCC:
            out = cf
        elif src_cs == C.COLORSPACE_GRAYSCALE:
            # gray replicated: Y = g, neutral chroma.  (The reference's
            # grayscale-dropon raw path garbles the buffer by re-reading a
            # 3-channel canvas as 1-channel — see SURVEY.md quirks; we
            # implement the evidently intended semantics instead.)
            out = jnp.stack([cf[..., 0], jnp.full_like(cf[..., 0], 128.0),
                             jnp.full_like(cf[..., 0], 128.0)], axis=-1)
        else:
            raise UnsupportedColorspaceError(str(src_cs))
        return [out[..., i] for i in range(3)]
    if jpeg_cs == C.JCS_RGB:
        if src_cs == C.COLORSPACE_RGB or src_cs == C.COLORSPACE_GRAYSCALE:
            return [cf[..., i] for i in range(3)]
        if src_cs == C.COLORSPACE_YCC:
            out = dctops.ycc_to_rgb(cf)
            return [out[..., i] for i in range(3)]
        raise UnsupportedColorspaceError(str(src_cs))
    if jpeg_cs == C.JCS_GRAYSCALE:
        if src_cs == C.COLORSPACE_RGB:
            return [dctops.rgb_to_ycc(cf)[..., 0]]
        return [cf[..., 0]]
    raise UnsupportedColorspaceError(f"jpeg colorspace {jpeg_cs}")


def compile_dropon(d: Dropon, img: CoefImage, blockoffset_x: int,
                   blockoffset_y: int, crop_x: int, crop_y: int, crop_w: int,
                   crop_h: int) -> CompiledDropon:
    """mj_compile_dropon (dropon.c:325-428), computed directly.

    Pads the cropped dropon by the block offsets (top-left) and up to the MCU
    multiple (bottom-right) with zeros — zero alpha means those pixels leave
    the image untouched, which is how sub-MCU placement is realized.
    """
    h_factor = img.sampling.h_factor
    v_factor = img.sampling.v_factor
    width = crop_w + blockoffset_x
    if width % h_factor:
        width += h_factor - (width % h_factor)
    height = crop_h + blockoffset_y
    if height % v_factor:
        height += v_factor - (height % v_factor)

    img_canvas = np.zeros((height, width, 3), dtype=np.float32)
    img_canvas[blockoffset_y:blockoffset_y + crop_h,
               blockoffset_x:blockoffset_x + crop_w] = \
        d.image[crop_y:crop_y + crop_h, crop_x:crop_x + crop_w]
    alpha_canvas = np.zeros((height, width, 3), dtype=np.float32)
    alpha_canvas[blockoffset_y:blockoffset_y + crop_h,
                 blockoffset_x:blockoffset_x + crop_w] = \
        d.alpha[crop_y:crop_y + crop_h, crop_x:crop_x + crop_w]

    jcs = img.jpeg_color_space
    planes = _convert_canvas(img_canvas, d.colorspace, jcs)
    ncomps = len(planes)

    max_h, max_v = img.sampling.max_h_samp, img.sampling.max_v_samp
    # 12-bit target frames: an 8-bit dropon sample p maps to the 12-bit
    # sample p<<4, so the dropon's DCT scales linearly by 16 (the alpha
    # weights are a 0..1 blend fraction and stay precision-independent)
    scale = float(1 << (getattr(img, "precision", 8) - 8))
    image_blocks, alpha_weights, samp = [], [], []
    for c in range(ncomps):
        ci = img.components[c]
        fh, fv = max_h // ci.h_samp, max_v // ci.v_samp
        blocks = np.asarray(_plane_to_dct_blocks(planes[c], fh, fv))
        image_blocks.append(blocks * scale if scale != 1.0 else blocks)
        # alpha: encoded claiming source colorspace == target so there is no
        # color transform (dropon.c:402-415); all three alpha channels are
        # identical, so each component just subsamples the same plane
        aplane = jnp.asarray(alpha_canvas[..., min(c, 2)])
        alpha_weights.append(np.asarray(_alpha_to_weights(aplane, fh, fv)))
        samp.append((ci.h_samp, ci.v_samp))

    from .ops.compose import mask_pix_np

    return CompiledDropon(image_colorspace=jcs, image_blocks=image_blocks,
                          alpha_weights=alpha_weights, samp_factors=samp,
                          mask_pixels=[mask_pix_np(w) for w in alpha_weights])


def compose(img: CoefImage, d: Dropon, align: int = 0, offset_x: int = 0,
            offset_y: int = 0) -> CoefImage:
    """mj_compose (compose.c:33-180).  Returns a new CoefImage.

    Region-only dataflow: only the overlay footprint crosses the host-device
    boundary (untouched MCUs never leave the host — that is also what makes
    them bit-exact for free).  Shares placement/compile/blend machinery with
    the batched path.
    """
    if img is None or d is None:
        raise NullDataError("image and dropon required")
    from .parallel.batch import BatchComposer

    out = img.copy()
    bc = BatchComposer(out, d, align, offset_x, offset_y)
    bc.compose_images([out])
    return out
