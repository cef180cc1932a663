"""Pallas TPU kernel for the masked-compose blend.

The blend operator sum_{kl} w_kl (S_k (x) S_l) (read off the reference's
unrolled convolve.c) is EXACTLY diagonal in the orthonormal 2-D DCT basis
(ops/compose.py:mask_pix_np, verified in test_compose_math), so the kernel
evaluates the mathematically identical pixel-domain form

  Y = X1 + U^T diag(m) U (X0 - X1),   U = C (x) C

as two MXU GEMMs around ONE VPU multiply by the precomputed
per-coefficient pixel mask m.  The previous S-basis kernel needed 16 GEMMs
and 64 VPU scale-add passes per tile and was VPU-bound at ~9% MFU; this
form removes 7/8 of the MXU work and ~97% of the VPU work.

Layout: TPU vregs are 128 lanes wide, so a [T, 64] operand wastes half of
every vector op and load.  The kernels therefore pack TWO blocks per row —
[T/2, 128] tiles against block-diagonal [128, 128] operators
diag(U, U) / diag(U^T, U^T) — filling the lanes for the GEMMs, the mask
multiply, and the int16 streams alike.

Two entry points:
  blend_blocks_pallas   — f32 blend only (ops.compose.blend_blocks_m
    contract: mask_pix, NOT S-basis alpha weights)
  compose_blocks_pallas — the FUSED compose step: int16 quantized
    coefficients in, int16 out, with dequantize (x coef*quant), blend,
    truncating correction and the reference's truncating requantize
    (compose.c:327-336, sign(v)*(|v|//q)) all inside the kernel.  XLA cannot
    fuse elementwise ops into a pallas_call, so keeping them outside costs
    full HBM round trips of [N,64] f32 intermediates; fused, the kernel
    streams int16 in / int16 out.  Untouched blocks (all-zero mask)
    reproduce region -> region exactly: the delta is exactly 0 and
    sign(r*q)*(|r*q|//q) == r.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .compose import _dct_kron

TILE = 2048  # blocks per grid step (rows of 2 packed blocks: TILE // 2)


def _blockdiag2(a):
    import numpy as np

    z = np.zeros_like(a)
    return np.block([[a, z], [z, a]]).astype(np.float32)


def _blend_kernel(x1_ref, x0_ref, m_ref, u_ref, ut_ref, y_ref):
    x1 = x1_ref[:]
    X = x0_ref[:] - x1                     # [T/2, 128]: 2 blocks per row
    hi = jax.lax.Precision.HIGHEST
    t = jnp.dot(X, u_ref[:], preferred_element_type=jnp.float32,
                precision=hi)              # to pixel domain (diag(U, U))
    t = t * m_ref[:]                       # pixel-domain mask
    y_ref[:] = x1 + jnp.dot(t, ut_ref[:], preferred_element_type=jnp.float32,
                            precision=hi)  # back: diag(U^T, U^T)


def blend_blocks_pallas(x_image: jax.Array, x_dropon: jax.Array,
                        mask_pix: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """Same contract as ops.compose.blend_blocks_m, flattened block layout.

    x_image/x_dropon/mask_pix: [N, 64] float32 (N padded to TILE
    internally).  Returns [N, 64] float32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x_image.shape[0]
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0))
        x_image = jnp.pad(x_image, pad)
        x_dropon = jnp.pad(x_dropon, pad)
        mask_pix = jnp.pad(mask_pix, pad)
    U = _dct_kron()
    r2 = n_pad // 2  # two blocks per packed row (free row-major reshape)

    grid = (n_pad // TILE,)
    tile_spec = pl.BlockSpec((TILE // 2, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((128, 128), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _blend_kernel,
        out_shape=jax.ShapeDtypeStruct((r2, 128), jnp.float32),
        grid=grid,
        in_specs=[tile_spec, tile_spec, tile_spec, const_spec, const_spec],
        out_specs=tile_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_pad * 64 * 128, bytes_accessed=4 * 4 * n_pad * 64,
            transcendentals=0),
        interpret=interpret,
    )(x_image.reshape(r2, 128), x_dropon.reshape(r2, 128),
      mask_pix.reshape(r2, 128), jnp.asarray(_blockdiag2(U)),
      jnp.asarray(_blockdiag2(U.T)))
    return out.reshape(n_pad, 64)[:n]


def _compose_kernel(reg_ref, x0_ref, m_ref, q_ref, u_ref, ut_ref, o_ref):
    reg = reg_ref[:].astype(jnp.int32)     # [T/2, 128]: 2 blocks per row
    q = q_ref[:]                           # [T/2, 128] i32 quant values
    x1 = reg.astype(jnp.float32) * q.astype(jnp.float32)   # dequantize
    X = x0_ref[:] - x1
    hi = jax.lax.Precision.HIGHEST
    t = jnp.dot(X, u_ref[:], preferred_element_type=jnp.float32,
                precision=hi)              # to pixel domain (rows: X @ U)
    t = t * m_ref[:]
    acc = x1 + jnp.dot(t, ut_ref[:], preferred_element_type=jnp.float32,
                       precision=hi)
    # integer epilogue, same op order as the unfused XLA path:
    # corr = trunc(y - x1); requantize by C-truncating division of
    # (region*q + corr)
    corr = jnp.trunc(acc - x1).astype(jnp.int32)
    vq = reg * q + corr
    out = jnp.sign(vq) * (jnp.abs(vq) // q)
    out = jnp.clip(out, -32768, 32767).astype(jnp.int16)
    o_ref[:] = out


def compose_blocks_pallas(region: jax.Array, x_dropon: jax.Array,
                          mask_pix: jax.Array, quant: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """Fused dequant + masked blend + truncating requant.

    region: [N, 64] int16 (or int32) quantized image coefficients
    x_dropon/mask_pix: [N, 64] float32 dropon coefficients / pixel mask
    quant: [N, 64] int32 quantization values (per-block, already broadcast)
    Returns [N, 64] int16 re-quantized composed coefficients.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = region.shape[0]
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0))
        region = jnp.pad(region, pad)
        x_dropon = jnp.pad(x_dropon, pad)
        mask_pix = jnp.pad(mask_pix, pad)
        quant = jnp.pad(quant, pad, constant_values=1)  # q=0 would divide by 0
    U = _dct_kron()
    r2 = n_pad // 2  # two blocks per packed row (free row-major reshape)

    grid = (n_pad // TILE,)

    def tspec(dt):
        return pl.BlockSpec((TILE // 2, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    const_spec = pl.BlockSpec((128, 128), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _compose_kernel,
        out_shape=jax.ShapeDtypeStruct((r2, 128), jnp.int16),
        grid=grid,
        in_specs=[tspec(0), tspec(1), tspec(2), tspec(3), const_spec,
                  const_spec],
        out_specs=tspec(4),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_pad * 64 * 128,
            bytes_accessed=(2 + 4 + 4 + 4 + 2) * n_pad * 64,
            transcendentals=0),
        interpret=interpret,
    )(region.reshape(r2, 128), x_dropon.reshape(r2, 128),
      mask_pix.reshape(r2, 128), quant.reshape(r2, 128),
      jnp.asarray(_blockdiag2(U)), jnp.asarray(_blockdiag2(U.T)))
    return out.reshape(n_pad, 64)[:n]
