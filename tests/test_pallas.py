"""Pallas kernel validation (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from libmodjpeg_tpu.ops.compose import (blend_blocks, blend_blocks_m,
                                        mask_pix_np)
from libmodjpeg_tpu.ops.pallas_compose import blend_blocks_pallas, TILE
from conftest import FIXTURE_IMAGES as IMAGES


@pytest.mark.parametrize("n", [1, 7, TILE, TILE + 3, 2 * TILE])
def test_pallas_blend_matches_einsum(n):
    """Pallas kernel vs the XLA m-path (same formulation, tight), and both
    vs the S-basis spec blend_blocks (different op order, loose)."""
    rng = np.random.RandomState(n)
    x1 = (rng.randn(n, 8, 8) * 300).astype(np.float32)
    x0 = (rng.randn(n, 8, 8) * 300).astype(np.float32)
    w = (rng.randn(n, 8, 8) * 0.02).astype(np.float32)
    w[:, 0, 0] = 0.25
    m = mask_pix_np(w)
    spec = np.asarray(blend_blocks(jnp.asarray(x1), jnp.asarray(x0),
                                   jnp.asarray(w)))
    ref = np.asarray(blend_blocks_m(jnp.asarray(x1), jnp.asarray(x0),
                                    jnp.asarray(m)))
    out = np.asarray(blend_blocks_pallas(
        jnp.asarray(x1.reshape(n, 64)), jnp.asarray(x0.reshape(n, 64)),
        jnp.asarray(m.reshape(n, 64)), interpret=True)).reshape(n, 8, 8)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(out, spec, rtol=1e-4, atol=5e-3)


def test_pallas_opaque_identity():
    """Opaque mask through the kernel: output == dropon (to fp32 eps)."""
    from libmodjpeg_tpu.ops.dct import fdct_blocks

    adct = np.rint(np.asarray(fdct_blocks(
        jnp.full((1, 8, 8), 255.0, jnp.float32))))[0]
    adct[0, 0] += 1024
    f = np.full((8, 8), 0.25)
    f[0, :] = 0.3535534 * 0.5
    f[:, 0] = 0.3535534 * 0.5
    f[0, 0] = 0.3535534 ** 2
    w = (adct * f / 1020.0).astype(np.float32)
    m = mask_pix_np(w)
    rng = np.random.RandomState(0)
    n = 16
    x1 = (rng.randn(n, 64) * 300).astype(np.float32)
    x0 = (rng.randn(n, 64) * 300).astype(np.float32)
    mb = np.broadcast_to(m.reshape(64), (n, 64)).astype(np.float32)
    out = np.asarray(blend_blocks_pallas(
        jnp.asarray(x1), jnp.asarray(x0), jnp.asarray(mb), interpret=True))
    np.testing.assert_allclose(out, x0, atol=3e-2)


@pytest.mark.parametrize("n", [1, 7, TILE, TILE + 3])
def test_fused_compose_matches_xla_sequence(n):
    """compose_blocks_pallas (dequant+blend+requant in-kernel) vs the unfused
    XLA op sequence.  Requantized coefficients may differ only where the f32
    blend lands exactly on a trunc edge (none expected at these magnitudes)."""
    from libmodjpeg_tpu.ops.compose import requant_trunc
    from libmodjpeg_tpu.ops.pallas_compose import compose_blocks_pallas

    rng = np.random.RandomState(100 + n)
    region = rng.randint(-900, 900, (n, 64)).astype(np.int16)
    x0 = (rng.randn(n, 64) * 300).astype(np.float32)
    m = (rng.rand(n, 64) * 0.9).astype(np.float32)
    q = rng.randint(1, 255, (n, 64)).astype(np.int32)

    out = np.asarray(compose_blocks_pallas(
        jnp.asarray(region), jnp.asarray(x0), jnp.asarray(m),
        jnp.asarray(q), interpret=True))

    ri = region.astype(np.int32)
    x1 = jnp.asarray(ri.astype(np.float32) * q)
    y = blend_blocks_m(x1.reshape(n, 8, 8), jnp.asarray(x0).reshape(n, 8, 8),
                       jnp.asarray(m).reshape(n, 8, 8)).reshape(n, 64)
    corr = np.trunc(np.asarray(y) - np.asarray(x1)).astype(np.int32)
    ref = np.asarray(requant_trunc(jnp.asarray(ri * q + corr),
                                   jnp.asarray(q)))
    ref = np.clip(ref, -32768, 32767).astype(np.int16)
    diff = out.astype(int) - ref.astype(int)
    assert np.abs(diff).max() <= 1
    assert (diff != 0).mean() < 0.005


def test_fused_compose_zero_mask_is_exact_identity():
    """All-zero mask weights (untouched blocks / the zero-alpha padding that
    realizes sub-block placement) must reproduce the input coefficients
    EXACTLY through the fused kernel — dequant+requant round-trip included."""
    from libmodjpeg_tpu.ops.pallas_compose import compose_blocks_pallas

    rng = np.random.RandomState(7)
    n = TILE + 5  # cover the padded tail too
    region = rng.randint(-2047, 2048, (n, 64)).astype(np.int16)
    x0 = (rng.randn(n, 64) * 500).astype(np.float32)
    w = np.zeros((n, 64), np.float32)
    q = rng.randint(1, 65535, (n, 64)).astype(np.int32)
    out = np.asarray(compose_blocks_pallas(
        jnp.asarray(region), jnp.asarray(x0), jnp.asarray(w),
        jnp.asarray(q), interpret=True))
    np.testing.assert_array_equal(out, region)


def test_compose_region_auto_routes_fused(monkeypatch):
    """compose_region_auto under MJT_PALLAS_INTERPRET takes the fused kernel
    and agrees with the XLA fallback path."""
    import libmodjpeg_tpu.ops.compose as oc

    rng = np.random.RandomState(3)
    shape = (2, 3, 4, 8, 8)
    region = rng.randint(-600, 600, shape).astype(np.int16)
    d = (rng.randn(*shape) * 200).astype(np.float32)
    a = (rng.rand(*shape) * 0.9).astype(np.float32)   # pixel-domain mask
    q = rng.randint(1, 128, (8, 8)).astype(np.int32)

    fallback = np.asarray(oc.compose_region_auto(
        jnp.asarray(region), jnp.asarray(d), jnp.asarray(a), jnp.asarray(q)))

    monkeypatch.setenv("MJT_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(oc, "_PALLAS_DECISION", True)
    try:
        fused = np.asarray(oc.compose_region_auto(
            jnp.asarray(region), jnp.asarray(d), jnp.asarray(a),
            jnp.asarray(q)))
    finally:
        monkeypatch.setattr(oc, "_PALLAS_DECISION", None)

    assert fused.dtype == np.int16 and fused.shape == shape
    diff = fused.astype(int) - fallback.astype(int)
    assert np.abs(diff).max() <= 1
    assert (diff != 0).mean() < 0.005


def test_pallas_routing_under_grid_sharding():
    """The production routing (blend_blocks_auto -> Pallas) must compile and
    run inside the GSPMD-sharded grid compose, not just standalone.  Forced
    via MJT_PALLAS_INTERPRET on the 8-device CPU mesh; the requantized output
    may differ from the einsum path only by float-rounding at trunc edges."""
    import os

    import libmodjpeg_tpu as mj
    import libmodjpeg_tpu.ops.compose as oc
    from libmodjpeg_tpu.parallel import compose_sharded, make_mesh
    from libmodjpeg_tpu.parallel import grid as pgrid

    img = mj.read_jpeg(f"{IMAGES}/image.jpg")
    logo = mj.read_dropon(f"{IMAGES}/dropon.png")
    single = mj.compose(img, logo, mj.ALIGN_CENTER, 3, -7)

    old = oc._PALLAS_DECISION
    os.environ["MJT_PALLAS_INTERPRET"] = "1"
    oc._PALLAS_DECISION = True
    pgrid._compose_component_sharded.clear_cache()
    try:
        mesh = make_mesh(batch=1, grid=8)
        assert oc.use_pallas_blend()
        sharded = compose_sharded(img, logo, mj.ALIGN_CENTER, 3, -7, mesh)
    finally:
        oc._PALLAS_DECISION = old
        del os.environ["MJT_PALLAS_INTERPRET"]
        pgrid._compose_component_sharded.clear_cache()

    for c in range(3):
        diff = sharded.coefs[c].astype(int) - single.coefs[c].astype(int)
        assert np.abs(diff).max() <= 1, f"comp {c}: {np.abs(diff).max()}"
        assert (diff != 0).mean() < 0.01, f"comp {c}: {(diff != 0).mean()}"
