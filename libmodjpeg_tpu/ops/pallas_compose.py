"""Pallas TPU kernel for the masked-compose blend.

The XLA einsum path (ops/compose.py:blend_blocks) materializes a per-block
[8,8,8,8] intermediate; this kernel instead streams tiles of flattened blocks
through VMEM using the Kronecker factorization

  (S_k (x) S_l) = (S_k (x) I) (I (x) S_l)

so the whole blend is 8 column-pass matmuls (Z_l = X @ ILt_l), a per-row
rescale by the mask weights, and 8 row-pass matmuls (Y += V_k @ KIt_k) —
[T,64]x[64,64] GEMMs that sit on the MXU, with the elementwise work fused on
the VPU.

Two entry points:
  blend_blocks_pallas   — f32 blend only (ops.compose.blend_blocks contract)
  compose_blocks_pallas — the FUSED compose step: int16 quantized
    coefficients in, int16 out, with dequantize (x coef*quant), blend,
    truncating correction and the reference's truncating requantize
    (compose.c:327-336, sign(v)*(|v|//q)) all inside the kernel.  XLA cannot
    fuse elementwise ops into a pallas_call, so keeping them outside costs
    full HBM round trips of [N,64] f32 intermediates; fused, the kernel
    streams int16 in / int16 out and does the elementwise work on the VPU
    between the MXU passes (integer ops incl. i32 divide lower exactly on
    TPU Mosaic — probed; untouched blocks (all-zero mask) reproduce
    region -> region exactly since the delta is exactly 0 and
    sign(r*q)*(|r*q|//q) == r).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .compose import basis_matrices_np

TILE = 256  # blocks per grid step


@functools.lru_cache(maxsize=1)
def _kron_mats() -> tuple:
    """KIt[k] = (S_k (x) I8)^T and ILt[l] = (I8 (x) S_l)^T, each [8,64,64]."""
    S = basis_matrices_np()
    eye = np.eye(8)
    ki = np.stack([np.kron(S[k], eye).T for k in range(8)])
    il = np.stack([np.kron(eye, S[l]).T for l in range(8)])
    return (ki.astype(np.float32), il.astype(np.float32))


def _blend_kernel(x1_ref, x0_ref, w_ref, ki_ref, il_ref, y_ref, z_scratch):
    x1 = x1_ref[:]
    X = x0_ref[:] - x1                     # [T, 64]
    w = w_ref[:]                           # [T, 64] (flattened k*8+l)
    # column pass: Z_l = X @ ILt[l]
    for l in range(8):
        z_scratch[l] = jnp.dot(X, il_ref[l], preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    # row pass with per-row mask scaling
    acc = x1
    for k in range(8):
        v = jnp.zeros_like(X)
        for l in range(8):
            v = v + w[:, k * 8 + l][:, None] * z_scratch[l]
        acc = acc + jnp.dot(v, ki_ref[k], preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    y_ref[:] = acc


def blend_blocks_pallas(x_image: jax.Array, x_dropon: jax.Array,
                        w_alpha: jax.Array, interpret: bool = False) -> jax.Array:
    """Same contract as ops.compose.blend_blocks, flattened block layout.

    x_image/x_dropon/w_alpha: [N, 64] float32 (N padded to TILE internally).
    Returns [N, 64] float32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x_image.shape[0]
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0))
        x_image = jnp.pad(x_image, pad)
        x_dropon = jnp.pad(x_dropon, pad)
        w_alpha = jnp.pad(w_alpha, pad)
    ki, il = _kron_mats()

    grid = (n_pad // TILE,)
    tile_spec = pl.BlockSpec((TILE, 64), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((8, 64, 64), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _blend_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, 64), jnp.float32),
        grid=grid,
        in_specs=[tile_spec, tile_spec, tile_spec, const_spec, const_spec],
        out_specs=tile_spec,
        scratch_shapes=[pltpu.VMEM((8, TILE, 64), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 16 * n_pad * 64 * 64, bytes_accessed=4 * 4 * n_pad * 64,
            transcendentals=0),
        interpret=interpret,
    )(x_image, x_dropon, w_alpha, jnp.asarray(ki), jnp.asarray(il))
    return out[:n]


def _compose_kernel(reg_ref, x0_ref, w_ref, q_ref, ki_ref, il_ref, o_ref,
                    z_scratch):
    # (A concatenated two-GEMM form — [T,64]x[64,512] + [T,512]x[512,64] —
    # was measured 1.3x SLOWER than this loop form on v5e: the in-kernel
    # concatenate and the [T,512] intermediates cost more than the wider
    # matmuls save.)
    reg = reg_ref[:].astype(jnp.int32)     # [T, 64] quantized coefficients
    q = q_ref[:]                           # [T, 64] i32 quant values
    x1 = reg.astype(jnp.float32) * q.astype(jnp.float32)   # dequantize
    X = x0_ref[:] - x1
    w = w_ref[:]
    # column pass: Z_l = X @ ILt[l]
    for l in range(8):
        z_scratch[l] = jnp.dot(X, il_ref[l],
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    # row pass with per-row mask scaling
    acc = x1
    for k in range(8):
        v = jnp.zeros_like(X)
        for l in range(8):
            v = v + w[:, k * 8 + l][:, None] * z_scratch[l]
        acc = acc + jnp.dot(v, ki_ref[k], preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    # integer epilogue, same op order as the unfused XLA path
    # (parallel/batch.py): corr = trunc(y - x1); requantize by C-truncating
    # division of (region*q + corr)
    corr = jnp.trunc(acc - x1).astype(jnp.int32)
    vq = reg * q + corr
    out = jnp.sign(vq) * (jnp.abs(vq) // q)
    out = jnp.clip(out, -32768, 32767).astype(jnp.int16)
    o_ref[:] = out


def compose_blocks_pallas(region: jax.Array, x_dropon: jax.Array,
                          w_alpha: jax.Array, quant: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """Fused dequant + masked blend + truncating requant.

    region: [N, 64] int16 (or int32) quantized image coefficients
    x_dropon/w_alpha: [N, 64] float32 dropon coefficients / mask weights
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
        w_alpha = jnp.pad(w_alpha, pad)
        quant = jnp.pad(quant, pad, constant_values=1)  # q=0 would divide by 0
    ki, il = _kron_mats()

    grid = (n_pad // TILE,)

    def tspec(_):
        return pl.BlockSpec((TILE, 64), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    const_spec = pl.BlockSpec((8, 64, 64), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _compose_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, 64), jnp.int16),
        grid=grid,
        in_specs=[tspec(0), tspec(1), tspec(2), tspec(3), const_spec,
                  const_spec],
        out_specs=tspec(4),
        scratch_shapes=[pltpu.VMEM((8, TILE, 64), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 16 * n_pad * 64 * 64,
            bytes_accessed=(2 + 4 + 4 + 4 + 2) * n_pad * 64,
            transcendentals=0),
        interpret=interpret,
    )(region, x_dropon, w_alpha, quant, jnp.asarray(ki), jnp.asarray(il))
    return out[:n]
