"""MCU-grid sharding: one huge image spread over the mesh.

BASELINE.json config-4: DCT-domain effects on a tiled 100MP JPEG with the
block grid sharded.  The compose/effect math is block-local (SURVEY.md §5
"long-context" analog), so sharding the grid axis needs no halo exchange;
XLA/GSPMD inserts whatever data movement an overlay spanning shard borders
requires.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..model import CoefImage
from ..ops import effects as fx
from ..ops.compose import compose_region_auto


def _shard_grid(mesh: Mesh, arr: np.ndarray) -> jax.Array:
    """Shard a [H, W, 8, 8] block grid's row axis over the whole mesh.

    The row axis is zero-padded up to the device-count multiple so exact
    divisibility is never required; callers trim back to the real row count
    (zero blocks are inert: every effect maps zero to zero modulo a DC shift
    that is dropped with the padding, and compose never addresses them)."""
    n = mesh.devices.size
    pad = (-arr.shape[0]) % n
    if pad:
        arr = np.concatenate(
            [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
    return jax.device_put(arr, NamedSharding(mesh, P(("batch", "grid"))))


@functools.partial(jax.jit, static_argnames=("effect",))
def _apply_effect(grid: jax.Array, quant: jax.Array, value: jax.Array,
                  effect: str) -> jax.Array:
    if effect == "zero":
        return fx.zero_component(grid)
    if effect == "pixelate":
        return fx.zero_ac(grid)
    if effect == "dc_add":
        return fx.add_to_dc(grid, quant, value)
    raise ValueError(effect)


def effects_sharded(img: CoefImage, effect: str, mesh: Mesh,
                    value: int = 0, cb_value: int = 0,
                    cr_value: int = 0) -> CoefImage:
    """Apply an effect with each component's block-row axis sharded over the
    whole mesh.  effect: 'grayscale' | 'pixelate' | 'tint' | 'luminance'."""
    from .. import constants as C

    out = img.copy()
    jcs_ok = img.jpeg_color_space == C.JCS_YCbCr
    for c in range(out.num_components):
        rows = out.coefs[c].shape[0]
        arr = _shard_grid(mesh, out.coefs[c])
        q = jnp.asarray(out.quant_table_for(c))
        if effect == "grayscale" and jcs_ok and c > 0:
            arr = _apply_effect(arr, q, jnp.int32(0), "zero")
        elif effect == "pixelate":
            arr = _apply_effect(arr, q, jnp.int32(0), "pixelate")
        elif effect == "tint" and jcs_ok and c == 1 and cb_value:
            arr = _apply_effect(arr, q, jnp.int32(cb_value), "dc_add")
        elif effect == "tint" and jcs_ok and c == 2 and cr_value:
            arr = _apply_effect(arr, q, jnp.int32(cr_value), "dc_add")
        elif effect == "luminance" and jcs_ok and c == 0:
            arr = _apply_effect(arr, q, jnp.int32(value), "dc_add")
        out.coefs[c] = np.asarray(arr)[:rows]
    return out


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("row0", "col0"))
def _compose_component_sharded(grid: jax.Array, dropon_blocks: jax.Array,
                               mask_pix: jax.Array, quant: jax.Array,
                               row0: int, col0: int) -> jax.Array:
    h, w = dropon_blocks.shape[:2]
    region = grid[row0:row0 + h, col0:col0 + w]
    out = compose_region_auto(region, dropon_blocks, mask_pix, quant)
    return grid.at[row0:row0 + h, col0:col0 + w].set(out)


def compose_sharded(img: CoefImage, dropon, align: int, offset_x: int,
                    offset_y: int, mesh: Mesh) -> CoefImage:
    """Compose onto a grid-sharded huge image.  The overlay region may span
    shard boundaries — GSPMD materializes the cross-shard slice/update."""
    from ..parallel.batch import BatchComposer

    bc = BatchComposer(img, dropon, align, offset_x, offset_y)
    out = img.copy()
    if bc.noop:
        return out
    for c in range(len(bc.cd.image_blocks)):
        ci = img.components[c]
        rows = out.coefs[c].shape[0]
        arr = _shard_grid(mesh, out.coefs[c])
        arr = _compose_component_sharded(
            arr, bc._dev_dropon[c], bc._dev_mask[c], bc._dev_quant[c],
            row0=bc.block_y * ci.v_samp, col0=bc.block_x * ci.h_samp)
        out.coefs[c] = np.asarray(arr)[:rows]
    return out
