"""Device-side Huffman symbol histograms: optimize as a mesh all-reduce.

libjpeg's optimized-tables mode is a serial two-pass host walk (jchuff
statistics then emission; the reference delegates to it via
image.c:170-189 ``optimize_coding``).  Every sequential-scan Huffman
symbol is derivable from the coefficient grid itself with vectorized ops:

- AC (run, size) symbols, ZRL and EOB are **block-local** — runs of zeros
  in zigzag order, magnitude categories, and the end-of-block condition
  depend only on the block's own 64 coefficients;
- DC difference categories need only each block's predecessor in scan
  order, a static gather (``seq_pred_indices``), with -1 sentinels where
  restart intervals reset the predictor.

So the whole statistics pass runs on device as bincounts over the (possibly
sharded) grids.  Under a mesh, XLA turns the replicated-output scatter-adds
into per-shard partial histograms + an all-reduce (SURVEY.md §7: "Huffman-
optimize as a global histogram pass — a natural all-reduce"): a grid-sharded
100MP image's optimize statistics never leave the device mesh until the
257-entry totals come back for table build.  The tables are then built by
the native encoder's own builder (codec.build_optimal_table) so tie-breaking
matches the host optimize pass exactly and the output file is byte-identical
to ``OPTION_OPTIMIZE``.

Scope: sequential Huffman scans (the reference's "optimize" for baseline
output).  Progressive per-scan statistics depend on EOB-run chunking and
stay in the native encoder's parallel host pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C

_ZIGZAG = jnp.asarray(np.asarray(C.ZIGZAG, dtype=np.int32))


def _bit_width(av: jax.Array) -> jax.Array:
    """Magnitude category: 0 for 0, floor(log2(av))+1 otherwise (av >= 0)."""
    s = jnp.zeros_like(av)
    for k in range(16):
        s = s + (av >= (1 << k)).astype(av.dtype)
    return s


@jax.jit
def ac_symbol_hist(blocks: jax.Array) -> jax.Array:
    """AC symbol counts for a sequential full scan, [256] int32.

    ``blocks``: [..., 8, 8] integer coefficients (natural order).  Counts
    exactly the symbols walk_seq_segment emits (encoder.inc): (run, size)
    per nonzero with ZRL (0xF0) for runs > 15, EOB (0x00) when the last
    nonzero is before position 63.
    """
    zz = jnp.take(blocks.reshape(-1, 64).astype(jnp.int32), _ZIGZAG, axis=1)
    ac = zz[:, 1:]                                   # [N, 63]
    nz = ac != 0
    idx = jnp.arange(1, 64, dtype=jnp.int32)
    marked = jnp.where(nz, idx, 0)
    incl = jax.lax.associative_scan(jnp.maximum, marked, axis=1)
    prev = jnp.concatenate(
        [jnp.zeros_like(incl[:, :1]), incl[:, :-1]], axis=1)
    run = idx - prev - 1                             # zeros since last nonzero
    size = _bit_width(jnp.abs(ac))
    sym = ((run & 15) << 4) | size
    hist = jnp.zeros(256, jnp.int32)
    hist = hist.at[jnp.where(nz, sym, 0)].add(nz.astype(jnp.int32))
    hist = hist.at[0xF0].add(jnp.sum(jnp.where(nz, run >> 4, 0)))
    last = incl[:, -1]                               # last nonzero position
    hist = hist.at[0].add(jnp.sum((last < 63).astype(jnp.int32)))
    return hist


@jax.jit
def dc_category_hist(blocks: jax.Array, pred_idx: jax.Array) -> jax.Array:
    """DC difference-category counts, [256] int32.

    ``pred_idx``: int32 [N] index of each block's predecessor in scan order
    (into the same flattened plane), or -1 where the predictor resets
    (scan/restart-segment starts) — see seq_pred_indices.
    """
    dc = blocks.reshape(-1, 64).astype(jnp.int32)[:, 0]
    pred = jnp.where(pred_idx >= 0, dc[jnp.maximum(pred_idx, 0)], 0)
    cat = _bit_width(jnp.abs(dc - pred))
    return jnp.zeros(256, jnp.int32).at[cat].add(1)


def seq_pred_indices(components, mcus_wide: int,
                     restart_interval: int = 0) -> list[np.ndarray]:
    """Static DC-predecessor maps for a sequential full scan.

    For each component (with its padded [ph, pw] block plane) returns the
    flattened row-major index of the block encoded immediately before it in
    the interleaved MCU walk, or -1 at scan/segment starts.  Single-component
    frames degenerate to raster order.  Purely geometric — computed once per
    (geometry, restart interval) on host.
    """
    interleaved = len(components) > 1
    out = []
    for ci in components:
        h, v = (ci.h_samp, ci.v_samp) if interleaved else (1, 1)
        pw = ci.padded_width_in_blocks
        ph = ci.padded_height_in_blocks
        mw = mcus_wide if interleaved else pw
        row, col = np.mgrid[0:ph, 0:pw]
        m = (row // v) * mw + (col // h)             # MCU index in the walk
        j = (row % v) * h + (col % h)                # block slot within MCU
        s = m * (h * v) + j                          # component walk index
        mp, jp = (s - 1) // (h * v), (s - 1) % (h * v)
        prow = (mp // mw) * v + jp // h
        pcol = (mp % mw) * h + jp % h
        pidx = prow * pw + pcol
        reset = (s == 0) | ((j == 0) & (restart_interval > 0)
                            & (m % max(restart_interval, 1) == 0))
        out.append(np.where(reset, -1, pidx).astype(np.int32).ravel())
    return out


def symbol_freqs(coefs, components, mcus_wide: int,
                 restart_interval: int = 0) -> dict:
    """Per-table-slot symbol frequencies for a sequential full scan.

    ``coefs``: list of [H, W, 8, 8] arrays (numpy or device/sharded jax) —
    the REAL padded planes (no mesh padding rows).  Slot assignment mirrors
    the encoder: component 0 -> slot 0, all others -> slot 1.  Returns
    {("dc"|"ac", slot): int64[257]} matching the native FreqSink counts
    exactly.
    """
    preds = seq_pred_indices(components, mcus_wide, restart_interval)
    freqs: dict = {}
    for c, blocks in enumerate(coefs):
        slot = 0 if c == 0 else 1
        dc = np.zeros(257, np.int64)
        ac = np.zeros(257, np.int64)
        dc[:256] = np.asarray(dc_category_hist(blocks, jnp.asarray(preds[c])))
        ac[:256] = np.asarray(ac_symbol_hist(blocks))
        for kind, h in (("dc", dc), ("ac", ac)):
            key = (kind, slot)
            freqs[key] = freqs.get(key, 0) + h
    return freqs


def optimal_tables(coefs, components, mcus_wide: int,
                   restart_interval: int = 0) -> list:
    """Device histogram -> native table build.  Returns the preset-table
    list codec.encode(preset_tables=...) accepts; the resulting file is
    byte-identical to the host OPTION_OPTIMIZE pass."""
    from .. import codec

    freqs = symbol_freqs(coefs, components, mcus_wide, restart_interval)
    tables = []
    for (kind, slot), f in sorted(freqs.items()):
        counts, syms = codec.build_optimal_table(f)
        tables.append((0 if kind == "dc" else 1, slot, counts, syms))
    return tables
