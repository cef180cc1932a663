"""Host codec microbench: per-path encode/decode MP/s on a synthetic 1080p
q85-like 4:2:0 image (the STATUS.md codec-throughput table's workload).

Usage: python tools/bench_encode.py [--reps N] [--paths seq,prog,...]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from libmodjpeg_tpu import codec  # noqa: E402
from libmodjpeg_tpu import constants as C  # noqa: E402
from tests.test_fuzz_roundtrip import random_image  # noqa: E402

OPTS = {
    "seq": 0,
    "opt": C.OPTION_OPTIMIZE,
    "prog": C.OPTION_PROGRESSIVE,
    "arith": C.OPTION_ARITHMETRIC,
    "prog+arith": C.OPTION_PROGRESSIVE | C.OPTION_ARITHMETRIC,
}


def _timeit(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def run(path: str, img, reps: int) -> float:
    mp = img.width * img.height / 1e6
    if path.startswith("dec-"):
        data = codec.encode(img, OPTS[path[4:]])
        best = min(_timeit(lambda: codec.decode(data)) for _ in range(reps))
    else:
        best = min(_timeit(lambda: codec.encode(img, OPTS[path]))
                   for _ in range(reps))
    return mp / best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mcus-w", type=int, default=120)   # 1920 px at 4:2:0
    ap.add_argument("--mcus-h", type=int, default=68)    # 1088 px
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--paths", default="seq,opt,prog,arith,"
                    "dec-seq,dec-prog,dec-arith")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    img = random_image(rng, "420", args.mcus_w, args.mcus_h, trim_y=8)
    for p in args.paths.split(","):
        print(f"{p:12s} {run(p, img, args.reps):8.1f} MP/s")


if __name__ == "__main__":
    main()
