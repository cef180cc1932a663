#!/usr/bin/env python3
"""Round-5 diagnostic: bisect the r03->r04 full-pipeline regression.

Measures the forced FULL decode->compose->re-encode stream (the metric that
fell 382.7 -> 301.3 between BENCH_r03 and BENCH_r04) under a small matrix of
the round-4 changes that could explain it:

  batch 32 (r03 config) vs 48 (r04 config)  x  uplink wirepack on/off
  x  downlink pack on/off (off == the r04 code; on == the round-5 fix)

and records the on-chip elementwise roofline probe alongside each run so
chip/tunnel weather is separable from code behavior.  Each configuration
runs in a fresh child process (its own jax client).

Usage: python scripts/diag_fullpath.py                 # run the matrix
       MJT_DIAG_CHILD=batch,wirepack,downpack python … # one child
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def child(batch: int, wirepack: bool, downpack: bool = True):
    sys.path.insert(0, REPO)
    from concurrent.futures import ThreadPoolExecutor

    import jax

    import libmodjpeg_tpu as mj
    from libmodjpeg_tpu import codec
    from libmodjpeg_tpu.encode_pixels import from_pixels
    from libmodjpeg_tpu.parallel.batch import BatchComposer

    sys.path.insert(0, os.path.join(REPO))
    import bench as benchmod

    rng = np.random.RandomState(42)
    W, H = 1920, 1088
    ITERS = 5
    try:
        setup_dev = jax.local_devices(backend="cpu")[0]
    except Exception:
        setup_dev = jax.devices()[0]
    jpegs = []
    with jax.default_device(setup_dev):
        for _ in range(batch):
            pix = benchmod.make_test_image(rng, W, H)
            jpegs.append(codec.encode(from_pixels(pix, quality=85,
                                                  subsampling="420")))
    logo = benchmod.make_logo(rng, 256, 64)
    dropon = mj.read_dropon_from_raw(logo, mj.COLORSPACE_RGBA, 256, 64)
    pool = ThreadPoolExecutor(max_workers=max(2, os.cpu_count() or 2))
    composer = BatchComposer(codec.decode(jpegs[0]), dropon,
                             mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT, -32, -32)

    def measure(n):
        total = 0
        for out in composer.watermark_stream(iter(jpegs * n), batch=batch,
                                             pool=pool, surgical=False):
            total += len(out)
        return total

    measure(1)  # warm
    t0 = time.perf_counter()
    measure(ITERS)
    dt = time.perf_counter() - t0
    mp = W * H / 1e6 * batch * ITERS
    stats = {k: round(v, 4) if isinstance(v, float) else v
             for k, v in composer.last_stream_stats.items()}

    # on-chip elementwise roofline control
    control = None
    if jax.devices()[0].platform != "cpu":
        import functools

        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnames=("r",))
        def chain_ew(x, x1, m, r):
            def body(i, a):
                return x1 + (a - x1 + i * 1e-6) * m
            return jax.lax.fori_loop(0, r, body, x).sum()

        nk, chain_r, reps = 131072, 10, 3
        x0k = jnp.asarray((rng.randn(nk, 64) * 300).astype(np.float32))
        wk = jnp.asarray((rng.rand(nk, 64) * 0.9).astype(np.float32))
        float(chain_ew(x0k, wk, x0k, chain_r))
        t0 = time.perf_counter()
        for _ in range(reps):
            float(chain_ew(x0k, wk, x0k, chain_r))
        dte = (time.perf_counter() - t0) / (reps * chain_r)
        control = round(4 * 4 * nk * 64 / dte / 1e9, 1)

    print(json.dumps({"batch": batch, "wirepack": wirepack,
                      "downpack": downpack,
                      "full_path_mp_s": round(mp / dt, 1),
                      "stream_stats": stats,
                      "roofline_ctrl_gbps": control}))


def main():
    # (batch, wirepack, downpack): r03 ≈ (32, False, False) minus the
    # dispatcher stage; r04 = (48, True, False); round-5 = (48, True, True)
    matrix = [(48, True, False), (32, True, False), (48, False, False),
              (48, True, True), (32, True, True)]
    for batch, wp, dp in matrix:
        env = dict(os.environ)
        env["MJT_DIAG_CHILD"] = f"{batch},{int(wp)},{int(dp)}"
        env.pop("MJT_NO_WIREPACK", None)
        env.pop("MJT_NO_DOWNPACK", None)
        if not wp:
            env["MJT_NO_WIREPACK"] = "1"
        if not dp:
            env["MJT_NO_DOWNPACK"] = "1"
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               timeout=900, capture_output=True,
                               text=True, env=env)
            got = False
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
                    got = True
            if not got:
                print(json.dumps({"batch": batch, "wirepack": wp,
                                  "downpack": dp, "error": "no output",
                                  "stderr": r.stderr[-300:]}), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"batch": batch, "wirepack": wp,
                              "downpack": dp, "error": "timeout"}),
                  flush=True)
    return 0


if __name__ == "__main__":
    spec = os.environ.get("MJT_DIAG_CHILD")
    if spec:
        parts = [int(x) for x in spec.split(",")]
        child(parts[0], bool(parts[1]),
              bool(parts[2]) if len(parts) > 2 else True)
    else:
        sys.exit(main())
