"""Corpus runner tests: resume, failure isolation, host sharding, buckets."""

import json
import os

import numpy as np
import pytest

import libmodjpeg_tpu as mj
from libmodjpeg_tpu import constants as C
from libmodjpeg_tpu.codec import decode, encode
from libmodjpeg_tpu.corpus import CorpusConfig, run_corpus, main as corpus_main

from conftest import FIXTURE_IMAGES as IMAGES


@pytest.fixture()
def corpus_dir(tmp_path):
    """A small mixed corpus: some 256x256, some odd-size, one corrupt."""
    import io
    from PIL import Image

    src = open(f"{IMAGES}/image.jpg", "rb").read()
    d = tmp_path / "in"
    d.mkdir()
    for i in range(5):
        (d / f"a{i}.jpg").write_bytes(src)
    small = Image.open(io.BytesIO(src)).crop((0, 0, 100, 60))
    for i in range(3):
        buf = io.BytesIO()
        small.save(buf, format="JPEG", quality=80)
        (d / f"b{i}.jpg").write_bytes(buf.getvalue())
    (d / "corrupt.jpg").write_bytes(b"\xff\xd8\xff\xdb garbage")
    return d


def test_corpus_run_and_resume(corpus_dir, tmp_path):
    out = tmp_path / "out"
    cfg = CorpusConfig(
        inputs=[str(corpus_dir)], output_dir=str(out),
        dropon_path=f"{IMAGES}/dropon.png",
        align=C.ALIGN_BOTTOM | C.ALIGN_RIGHT, batch_size=4)
    summary = run_corpus(cfg)
    assert summary["files_done"] == 8
    assert summary["files_failed"] == 1  # corrupt.jpg isolated, not fatal
    assert summary["mp_per_s"] > 0

    # outputs decode and the compose actually happened (footprint differs)
    outp = out / "a0.jpg"
    ref = decode(open(f"{IMAGES}/image.jpg", "rb").read())
    got = decode(outp.read_bytes())
    assert not all(np.array_equal(ref.coefs[c], got.coefs[c]) for c in range(3))

    # resume: nothing left to do
    cfg2 = CorpusConfig(
        inputs=[str(corpus_dir)], output_dir=str(out),
        dropon_path=f"{IMAGES}/dropon.png",
        align=C.ALIGN_BOTTOM | C.ALIGN_RIGHT, batch_size=4, resume=True)
    summary2 = run_corpus(cfg2)
    assert summary2["files_done"] == 0
    assert summary2["skipped_resume"] == 8


def test_corpus_host_sharding(corpus_dir, tmp_path):
    done = set()
    for host in range(3):
        out = tmp_path / f"out{host}"
        cfg = CorpusConfig(
            inputs=[str(corpus_dir)], output_dir=str(out),
            dropon_path=f"{IMAGES}/dropon.png", num_hosts=3, host_id=host,
            batch_size=4)
        run_corpus(cfg)
        with open(out / f"manifest_h{host}.jsonl") as f:
            for line in f:
                rec = json.loads(line)
                if rec["status"] == "done":
                    assert rec["input"] not in done  # disjoint shards
                    done.add(rec["input"])
    assert len(done) == 8


def test_corpus_effects_cli(corpus_dir, tmp_path):
    out = tmp_path / "fx"
    rc = corpus_main([
        "--inputs", str(corpus_dir / "a0.jpg"), str(corpus_dir / "a1.jpg"),
        "--out", str(out), "--pixelate", "--tint", "40,-20",
        "--progressive"])
    assert rc == 0
    img = decode((out / "a0.jpg").read_bytes())
    assert img.progressive
    # pixelate happened: all ACs zero
    for c in range(3):
        assert (img.coefs[c][..., 0, 1:] == 0).all()
    # matches direct API chain
    direct = mj.effect_pixelate(
        mj.effect_tint(mj.read_jpeg(f"{IMAGES}/image.jpg"), 40, -20))
    for c in range(3):
        np.testing.assert_array_equal(img.coefs[c], direct.coefs[c])


def test_corpus_max_failures(corpus_dir, tmp_path):
    cfg = CorpusConfig(
        inputs=[str(corpus_dir)], output_dir=str(tmp_path / "mf"),
        dropon_path=f"{IMAGES}/dropon.png", batch_size=4, max_failures=0)
    with pytest.raises(RuntimeError):
        run_corpus(cfg)


def test_corpus_stream_surgical_engages(tmp_path):
    """Pure watermarking goes through the streaming pipeline, and
    restart-segmented inputs take the surgical path from run_corpus
    (not just from bench code).  Outputs must decode identically to the
    legacy decode->compose->encode path."""
    from libmodjpeg_tpu.encode_pixels import from_pixels

    rng = np.random.RandomState(3)
    d = tmp_path / "in"
    d.mkdir()
    for i in range(4):
        pix = rng.randint(0, 255, (240, 320, 3), dtype=np.uint8)
        img = from_pixels(pix, quality=85, subsampling="420")
        (d / f"s{i}.jpg").write_bytes(encode(img, restart_interval=8))
    # one restart-free file: per-file fallback, not a bucket fallback
    pix = rng.randint(0, 255, (240, 320, 3), dtype=np.uint8)
    img = from_pixels(pix, quality=85, subsampling="420")
    (d / "zfree.jpg").write_bytes(encode(img))

    logo = rng.randint(0, 255, (40, 96, 4), dtype=np.uint8)
    import PIL.Image
    PIL.Image.fromarray(logo, "RGBA").save(tmp_path / "logo.png")

    out = tmp_path / "out"
    cfg = CorpusConfig(
        inputs=[str(d)], output_dir=str(out),
        dropon_path=str(tmp_path / "logo.png"),
        align=C.ALIGN_BOTTOM | C.ALIGN_RIGHT, batch_size=8)
    summary = run_corpus(cfg)
    assert summary["files_done"] == 5
    assert summary["files_failed"] == 0
    assert summary["pipeline"] == "stream"
    # 4 surgical-eligible + 1 fallback in the same (mixed) bucket
    assert summary["stream_paths"] == {"mixed": 5}
    assert summary["surgical_fallbacks"] == {"restart-interval": 1}

    # legacy loop (forced via an effects no-op is not possible; use the
    # library API directly) must produce identical coefficients
    dropon = mj.read_dropon(str(tmp_path / "logo.png"))
    for f in sorted(d.glob("*.jpg")):
        ref = mj.compose(mj.read_jpeg(str(f)), dropon,
                         C.ALIGN_BOTTOM | C.ALIGN_RIGHT)
        got = decode((out / f.name).read_bytes())
        for c in range(got.num_components):
            np.testing.assert_array_equal(got.coefs[c], ref.coefs[c])
