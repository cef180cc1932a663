"""On-chip microbench: Pallas blend kernel vs the XLA einsum path.

Methodology notes (learned the hard way on the tunneled chip):
- naive dispatch-loop timing measures the async dispatch floor (~25us),
  not device work; the blends are chained inside one jitted fori_loop so
  the device must execute them serially, and the output is reduced to a
  scalar and fetched so readiness cannot be faked by the relay.
- the einsum path materializes [N,8,8,8] intermediates which the TPU
  tiling pads 16x (minor dim 8 -> lane width 128).  At N=262144 that is a
  17GB HBM demand -> OOM; the Pallas kernel streams [T,64] tiles and has
  no such cliff.  Measured (v5e, 2026-08-18):

    n=16384:  einsum 6.3ms/blend   pallas 5.4ms/blend   (1.2x)
    n=65536:  einsum 16.9ms/blend  pallas 3.8ms/blend   (4.4x)
    n=131072: einsum 31.9ms/blend  pallas 5.0ms/blend   (6.3x)
    n=262144: einsum OOM (17.1G padded HBM)  pallas runs

  (absolute times include a tunnel-RTT share; the ratio is the signal.)
  Hence use_pallas_blend() defaults to the Pallas kernel on TPU backends.
"""

import argparse
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libmodjpeg_tpu.ops.compose import blend_blocks_m
from libmodjpeg_tpu.ops.pallas_compose import (blend_blocks_pallas,
                                               compose_blocks_pallas)

# The diagonalized pixel-mask blend (DCT -> mask multiply -> IDCT) has ~2
# useful f32 FLOPs per byte of traffic: it is BANDWIDTH-bound, so the
# meaningful on-chip figure is achieved bytes/s vs the chip's elementwise
# roofline (measured below in the same chained harness), not an MXU peak.
BYTES_PER_BLOCK = (2 + 4 + 4 + 4 + 2) * 64  # i16 in/out + f32 d/m + i32 q


@partial(jax.jit, static_argnames=("kind", "r"))
def chain(x1, x0, w, kind, r):
    n = x1.shape[0]

    def body(i, acc):
        xs = acc + i * 1e-6  # prevent loop-invariant hoisting
        if kind == "einsum":
            y = blend_blocks_m(xs.reshape(n, 8, 8), x0.reshape(n, 8, 8),
                               w.reshape(n, 8, 8)).reshape(n, 64)
        else:
            y = blend_blocks_pallas(xs, x0, w)
        return y * 0.999

    return jax.lax.fori_loop(0, r, body, x1).sum()


@partial(jax.jit, static_argnames=("r",))
def chain_fused(region, x0, w, q, r):
    """Chained FUSED compose (int16 in/out incl. dequant+requant)."""

    def body(i, acc):
        xs = acc ^ (i % 2).astype(jnp.int16)  # prevent hoisting, stays i16
        return compose_blocks_pallas(xs, x0, w, q)

    return jax.lax.fori_loop(0, r, body, region).sum()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[16384, 65536, 131072])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=10)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    print("platform:", jax.devices()[0].platform)
    for n in args.sizes:
        x1 = jnp.asarray((rng.randn(n, 64) * 300).astype(np.float32))
        x0 = jnp.asarray((rng.randn(n, 64) * 300).astype(np.float32))
        w = jnp.asarray((rng.rand(n, 64) * 0.9).astype(np.float32))
        line = f"n={n}:"
        times = {}
        for kind in ("einsum", "pallas"):
            try:
                float(chain(x1, x0, w, kind, args.chain))  # warm + force
            except Exception as e:
                line += f" {kind} FAILED ({type(e).__name__})"
                continue
            t0 = time.perf_counter()
            for _ in range(args.reps):
                v = float(chain(x1, x0, w, kind, args.chain))
            dt = (time.perf_counter() - t0) / (args.reps * args.chain)
            times[kind] = dt
            line += f" {kind} {dt*1e6:.0f}us/blend"
        region = jnp.asarray(rng.randint(-900, 900, (n, 64)).astype(np.int16))
        q = jnp.asarray(rng.randint(1, 255, (n, 64)).astype(np.int32))
        try:
            int(chain_fused(region, x0, w, q, args.chain))  # warm + force
            t0 = time.perf_counter()
            for _ in range(args.reps):
                int(chain_fused(region, x0, w, q, args.chain))
            dt = (time.perf_counter() - t0) / (args.reps * args.chain)
            times["fused"] = dt
            gbps = BYTES_PER_BLOCK * n / dt / 1e9
            roof = None
            if "einsum" in times:
                # einsum path traffic: 3 f32 reads + 1 f32 write per coef
                roof = 4 * 4 * n * 64 / times["einsum"] / 1e9
            line += (f" fused {dt*1e6:.0f}us/compose [{gbps:.0f} GB/s"
                     + (f" = {100*gbps/roof:.0f}% of the {roof:.0f} GB/s"
                        f" elementwise-roofline" if roof else "") + "]")
        except Exception as e:
            line += f" fused FAILED ({type(e).__name__})"
        if "einsum" in times and "pallas" in times:
            line += f"  speedup x{times['einsum']/times['pallas']:.2f}"
        print(line)


if __name__ == "__main__":
    main()
