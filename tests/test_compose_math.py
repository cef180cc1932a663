"""Mathematical validation of the masked-compose kernel.

Verifies the batched-matmul reformulation against the properties that pin
down the reference's convolve.c:29-1096 operator structure and
dropon.c:542-566 mask normalization.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from libmodjpeg_tpu.ops.compose import (
    basis_matrices_np,
    blend_blocks,
    requant_trunc,
)
from libmodjpeg_tpu.ops.dct import fdct_blocks, idct_blocks


def alpha_weights_from_pixels(alpha_pix: np.ndarray) -> np.ndarray:
    """Compile an 8x8 alpha-pixel block to normalized mask weights, exactly
    like the reference: Q100 FDCT, DC+1024, scale by c(i)c(j)/1020."""
    adct = np.rint(np.asarray(fdct_blocks(jnp.asarray(alpha_pix, jnp.float32)[None]))[0])
    adct[0, 0] += 1024
    f = np.full((8, 8), 0.25)
    f[0, :] = 0.3535534 * 0.5
    f[:, 0] = 0.3535534 * 0.5
    f[0, 0] = 0.3535534 ** 2
    return (adct * f / 1020.0).astype(np.float32)


def _rand_blocks(rng, n):
    return rng.randint(-500, 500, (n, 8, 8)).astype(np.float32)


def test_opaque_mask_is_identity():
    """alpha=255 everywhere -> composed output == dropon exactly."""
    w = alpha_weights_from_pixels(np.full((8, 8), 255.0))
    assert abs(w[0, 0] - 0.25) < 1e-6
    rng = np.random.RandomState(1)
    x1, x0 = _rand_blocks(rng, 5), _rand_blocks(rng, 5)
    y = np.asarray(blend_blocks(jnp.asarray(x1), jnp.asarray(x0),
                                jnp.broadcast_to(jnp.asarray(w), (5, 8, 8))))
    np.testing.assert_allclose(y, x0, atol=2e-2)


def test_transparent_mask_is_noop():
    """alpha=0 everywhere -> output == image exactly (w' is all zeros)."""
    w = alpha_weights_from_pixels(np.zeros((8, 8)))
    np.testing.assert_array_equal(w, np.zeros((8, 8), np.float32))
    rng = np.random.RandomState(2)
    x1, x0 = _rand_blocks(rng, 4), _rand_blocks(rng, 4)
    y = np.asarray(blend_blocks(jnp.asarray(x1), jnp.asarray(x0),
                                jnp.broadcast_to(jnp.asarray(w), (4, 8, 8))))
    np.testing.assert_array_equal(y, x1)


def test_uniform_half_blend_is_linear_mix():
    """Uniform alpha=a -> y ~= x1 + a/255 (x0 - x1)."""
    for a in (64, 128, 200):
        w = alpha_weights_from_pixels(np.full((8, 8), float(a)))
        rng = np.random.RandomState(3)
        x1, x0 = _rand_blocks(rng, 6), _rand_blocks(rng, 6)
        y = np.asarray(blend_blocks(jnp.asarray(x1), jnp.asarray(x0),
                                    jnp.broadcast_to(jnp.asarray(w), (6, 8, 8))))
        expect = x1 + (a / 255.0) * (x0 - x1)
        assert np.abs(y - expect).max() < 0.2


def test_matches_scalar_operator_sum():
    """Batched einsum == direct sum_{kl} w_kl S_k X S_l^T (the convolve.c
    operator read off case-by-case)."""
    S = basis_matrices_np()
    rng = np.random.RandomState(4)
    alpha = rng.randint(0, 256, (8, 8)).astype(np.float64)
    w = alpha_weights_from_pixels(alpha)
    x1, x0 = _rand_blocks(rng, 1), _rand_blocks(rng, 1)
    X = (x0[0] - x1[0]).astype(np.float64)
    y_ref = x1[0] + sum(
        w[k, l] * (S[k] @ X @ S[l].T) for k in range(8) for l in range(8))
    y = np.asarray(blend_blocks(jnp.asarray(x1), jnp.asarray(x0),
                                jnp.asarray(w)[None]))[0]
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-2)


def test_spatial_domain_equivalence():
    """The DCT-domain blend equals pixel-domain masked compositing.

    Jonsson's theorem: DCT(w*x pointwise) = W (*) X with this normalization.
    Build random pixel blocks, composite in pixel space, FDCT — must match
    the coefficient-domain blend.
    """
    rng = np.random.RandomState(5)
    img_pix = rng.randint(0, 256, (8, 8)).astype(np.float64)
    drop_pix = rng.randint(0, 256, (8, 8)).astype(np.float64)
    alpha = rng.randint(0, 256, (8, 8)).astype(np.float64)

    x1 = np.asarray(fdct_blocks(jnp.asarray(img_pix, jnp.float32)[None]))[0]
    x0 = np.asarray(fdct_blocks(jnp.asarray(drop_pix, jnp.float32)[None]))[0]
    w = alpha_weights_from_pixels(alpha)

    y = np.asarray(blend_blocks(jnp.asarray(x1)[None], jnp.asarray(x0)[None],
                                jnp.asarray(w)[None]))[0]
    y_pix = np.asarray(idct_blocks(jnp.asarray(y)[None]))[0]

    expect_pix = img_pix + (alpha / 255.0) * (drop_pix - img_pix)
    # Q100-rounding of the alpha DCT costs a little accuracy; ~0.5 gray level
    assert np.abs(y_pix - expect_pix).max() < 0.75


def test_requant_trunc_matches_c_division():
    """Truncating division semantics (compose.c:327-336): C '/' rounds
    toward zero for negative values, unlike numpy floor division."""
    v = jnp.asarray(np.array([[-7, 7, -8, 8], [-1, 1, 0, -15]] * 8,
                             dtype=np.int32).reshape(4, 4, 2, 2))
    # build full 8x8 shapes instead
    vals = np.arange(-64, 64, dtype=np.int32).reshape(2, 8, 8)
    q = np.full((8, 8), 5, dtype=np.int32)
    out = np.asarray(requant_trunc(jnp.asarray(vals), jnp.asarray(q)))
    expect = np.trunc(vals / 5).astype(np.int32)
    np.testing.assert_array_equal(out, expect)


def test_roundtrip_requant_lossless_for_untouched():
    """dequant -> requant with the same table is exact: guarantees blocks
    with zero-alpha correction stay bit-identical (the reference's core
    losslessness claim, README.md:69-81)."""
    rng = np.random.RandomState(6)
    coefs = rng.randint(-1023, 1023, (10, 8, 8)).astype(np.int32)
    q = rng.randint(1, 255, (8, 8)).astype(np.int32)
    dq = coefs * q
    back = np.asarray(requant_trunc(jnp.asarray(dq), jnp.asarray(q)))
    np.testing.assert_array_equal(back, coefs)
