"""True multi-process jax.distributed validation (2 coordinator-connected
processes, 4 virtual CPU devices each -> one 8-device global mesh).

Round-1 only tested the single-process mesh; these tests execute the real
multi-controller path: parallel.init_distributed (gloo CPU collectives), a
global-mesh batched compose whose output shards live on different processes,
and the corpus runner's host sharding — asserting bit-identical results to
the single-process implementations.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from conftest import FIXTURE_IMAGES as IMAGES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_workers(args_per_proc, timeout=180):
    """Launch N coordinated workers, return their stdouts; raise on failure."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("MJT_COORDINATOR", None)
    procs = [subprocess.Popen([sys.executable, WORKER] + [str(a) for a in args],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE)
             for args in args_per_proc]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (
            f"worker failed rc={p.returncode}\nstdout:{out.decode()}\n"
            f"stderr:{err.decode()[-3000:]}")
        outs.append(out.decode())
    return outs


def test_two_process_compose_bit_identical(tmp_path):
    """Global-mesh compose across 2 processes == single-process compose."""
    import libmodjpeg_tpu as mj
    from mp_worker import make_batch

    port = _free_port()
    n_images = 8
    _spawn_workers([
        (0, 2, port, tmp_path, "compose", n_images),
        (1, 2, port, tmp_path, "compose", n_images),
    ])

    # merge each process's addressable output shards
    merged = {}
    for pid in range(2):
        with np.load(tmp_path / f"shards_p{pid}.npz") as z:
            for k in z.files:
                merged[k] = z[k]

    images = make_batch(n_images)
    logo = mj.read_dropon(f"{IMAGES}/dropon.png")
    singles = [mj.compose(im, logo, mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT, -5, -3)
               for im in images]

    for c in range(3):
        got = np.zeros((n_images,) + singles[0].coefs[c].shape, np.int16)
        seen = np.zeros(n_images, bool)
        for k, v in merged.items():
            if not k.startswith(f"c{c}_"):
                continue
            i0 = int(k.split("_i")[1])
            got[i0:i0 + v.shape[0]] = v
            seen[i0:i0 + v.shape[0]] = True
        assert seen.all(), f"comp {c}: missing shards"
        for i in range(n_images):
            np.testing.assert_array_equal(
                got[i], singles[i].coefs[c],
                err_msg=f"comp {c} image {i} differs from single-process")


def test_two_process_corpus_matches_single_host(tmp_path):
    """Corpus runner sharded over 2 coordinated processes: the union of host
    outputs must be byte-identical to a 1-host run."""
    from libmodjpeg_tpu import constants as C
    from libmodjpeg_tpu.corpus import CorpusConfig, run_corpus
    from mp_worker import make_batch
    from libmodjpeg_tpu.jpegio import write_jpeg

    indir = tmp_path / "in"
    indir.mkdir()
    for i, im in enumerate(make_batch(6)):
        write_jpeg(im, str(indir / f"img{i:03d}.jpg"))

    out1 = tmp_path / "single"
    cfg = CorpusConfig(
        inputs=[str(indir)], output_dir=str(out1),
        dropon_path=f"{IMAGES}/dropon.png",
        align=C.ALIGN_BOTTOM | C.ALIGN_RIGHT,
        effects=[("luminance", (35,))], batch_size=4)
    s = run_corpus(cfg)
    assert s["files_failed"] == 0 and s["files_done"] == 6

    out2 = tmp_path / "multi"
    port = _free_port()
    outs = _spawn_workers([
        (0, 2, port, tmp_path, "corpus", indir, out2),
        (1, 2, port, tmp_path, "corpus", indir, out2),
    ])
    done = sum(json.loads(o.splitlines()[-1])["files_done"] for o in outs)
    assert done == 6

    names = sorted(p.name for p in out1.iterdir() if p.suffix == ".jpg")
    assert sorted(p.name for p in out2.iterdir()
                  if p.suffix == ".jpg") == names
    for n in names:
        assert (out1 / n).read_bytes() == (out2 / n).read_bytes(), n

    # per-host manifests exist and partition the corpus
    m0 = (out2 / "manifest_h0.jsonl").read_text().splitlines()
    m1 = (out2 / "manifest_h1.jsonl").read_text().splitlines()
    h0 = {json.loads(l)["input"] for l in m0}
    h1 = {json.loads(l)["input"] for l in m1}
    assert not (h0 & h1) and len(h0 | h1) == 6
