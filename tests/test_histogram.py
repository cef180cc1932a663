"""Device-side Huffman-optimize histograms (ops/histogram.py).

The optimize statistics pass runs as bincounts on the (sharded) coefficient
grids; tables built from the device histograms must reproduce the host
OPTION_OPTIMIZE output byte for byte (same frequencies -> same jchuff
tie-breaking -> same DHT -> same stream).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from libmodjpeg_tpu import codec
from libmodjpeg_tpu import constants as C
from libmodjpeg_tpu.ops.histogram import optimal_tables, symbol_freqs
from libmodjpeg_tpu.parallel import GridSession, make_mesh

from test_fuzz_roundtrip import random_image


def _mcus_wide(img):
    c0 = img.components[0]
    return c0.padded_width_in_blocks // c0.h_samp


@pytest.mark.parametrize("sampling,ri", [("420", 0), ("420", 5), ("444", 0),
                                         ("gray", 0), ("gray", 3),
                                         ("cmyk420", 0), ("422", 7)])
def test_device_tables_byte_identical(sampling, ri):
    rng = np.random.RandomState(hash(("hist", sampling, ri)) % 2 ** 31)
    img = random_image(rng, sampling, 9, 7, trim_x=3, trim_y=5)
    host = codec.encode(img, options=C.OPTION_OPTIMIZE, restart_interval=ri)
    tables = optimal_tables(img.coefs, img.components, _mcus_wide(img), ri)
    dev = codec.encode(img, restart_interval=ri, preset_tables=tables)
    assert dev == host


def test_device_tables_12bit():
    rng = np.random.RandomState(12)
    img = random_image(rng, "420", 6, 5, precision=12)
    # 12-bit sequential forces optimized tables in the encoder
    host = codec.encode(img, options=C.OPTION_OPTIMIZE)
    tables = optimal_tables(img.coefs, img.components, _mcus_wide(img), 0)
    dev = codec.encode(img, preset_tables=tables)
    assert dev == host


def test_sharded_histogram_is_an_all_reduce():
    """Histograms over mesh-sharded planes == unsharded, with the inputs
    REALLY sharded (per-shard partials + XLA all-reduce, not a host gather)."""
    rng = np.random.RandomState(7)
    img = random_image(rng, "420", 16, 16)
    mesh = make_mesh(batch=1, grid=8)
    sharded = []
    for a in img.coefs:
        arr = jax.device_put(a, NamedSharding(mesh, P(("batch", "grid"))))
        assert len(arr.sharding.device_set) == 8
        assert not arr.sharding.is_fully_replicated
        sharded.append(arr)
    f_sharded = symbol_freqs(sharded, img.components, _mcus_wide(img))
    f_host = symbol_freqs(img.coefs, img.components, _mcus_wide(img))
    for k in f_host:
        np.testing.assert_array_equal(f_sharded[k], f_host[k])


def test_grid_session_optimized_encode():
    """GridSession.to_jpeg(OPTIMIZE): stats on the mesh (with padded rows
    excluded), output byte-identical to the host optimize pass."""
    rng = np.random.RandomState(3)
    img = random_image(rng, "420", 8, 13)  # 13 rows: not divisible by 8
    mesh = make_mesh(batch=1, grid=8)
    sess = GridSession(img, mesh)
    data = sess.to_jpeg(options=C.OPTION_OPTIMIZE, restart_interval=4)
    host = codec.encode(img, options=C.OPTION_OPTIMIZE, restart_interval=4)
    assert data == host
    back = codec.decode(data)
    for c in range(img.num_components):
        np.testing.assert_array_equal(back.coefs[c], img.coefs[c])
