#!/usr/bin/env python3
"""Headline benchmark: composited megapixels/s/chip, end-to-end.

Workload (BASELINE.json config-3 shape): watermark a batch of 1080p 4:2:0
JPEGs with an alpha-masked logo — full pipeline per iteration:
entropy decode (parallel C++ codec) -> device masked compose -> entropy
encode (parallel C++ codec).  Prints ONE JSON line.

vs_baseline is against the 50 MP/s/chip north-star target (the reference
itself publishes no throughput numbers — SURVEY.md §6).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def make_test_image(rng, w, h):
    """Photo-like synthetic pixels: smooth gradients + mild texture so the
    entropy codec sees realistic coefficient statistics."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (128 + 80 * np.sin(xx / 97.0) * np.cos(yy / 71.0)
            + 40 * np.sin((xx + yy) / 31.0))
    tex = rng.randn(h // 8 + 1, w // 8 + 1).astype(np.float32) * 14
    tex = np.kron(tex, np.ones((8, 8), np.float32))[:h, :w]
    img = np.stack([
        base + tex,
        base * 0.9 + tex + 10 * np.sin(yy / 53.0),
        base * 1.05 - tex * 0.5,
    ], axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_logo(rng, w, h):
    logo = rng.randint(0, 255, (h, w, 4), dtype=np.uint8)
    # soft alpha: opaque core, transparent border
    yy, xx = np.mgrid[0:h, 0:w]
    d = np.minimum.reduce([xx, yy, w - 1 - xx, h - 1 - yy]).astype(np.float32)
    logo[..., 3] = np.clip(d * 24, 0, 255).astype(np.uint8)
    return logo


def _probe_device(timeout_s: float = 240.0) -> bool:
    """Check in a subprocess that the configured jax backend actually comes
    up (the tunneled TPU can wedge if a previous client died mid-claim); on
    failure fall back to CPU so the bench still measures the pipeline."""
    import subprocess

    code = ("import jax, numpy as np;"
            "d = jax.device_put(np.zeros((8, 8), np.int16));"
            "d.block_until_ready(); print('ok')")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
        return "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _probe_device():
        print(json.dumps({"event": "device_probe_failed",
                          "fallback": "cpu"}), file=sys.stderr)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import libmodjpeg_tpu as mj
    from libmodjpeg_tpu import codec
    from libmodjpeg_tpu.encode_pixels import from_pixels
    from libmodjpeg_tpu.parallel.batch import BatchComposer

    import jax

    rng = np.random.RandomState(42)
    W, H = 1920, 1088
    BATCH = int(os.environ.get("MJT_BENCH_BATCH", "8"))
    ITERS = int(os.environ.get("MJT_BENCH_ITERS", "5"))
    RESTART = 32  # MCUs per restart segment -> parallel codec

    # build the corpus on the CPU backend: corpus synthesis is setup, not the
    # measured pipeline, and keeping it off the accelerator avoids paying
    # (and possibly wedging) tunnel transfers for throwaway data
    jpegs = []
    try:
        setup_dev = jax.local_devices(backend="cpu")[0]
    except Exception:
        setup_dev = jax.devices()[0]
    with jax.default_device(setup_dev):
        for i in range(BATCH):
            pix = make_test_image(rng, W, H)
            img = from_pixels(pix, quality=85, subsampling="420")
            jpegs.append(codec.encode(img, restart_interval=RESTART))
    logo = make_logo(rng, 256, 64)
    dropon = mj.read_dropon_from_raw(logo, mj.COLORSPACE_RGBA, 256, 64)

    template = codec.decode(jpegs[0])
    composer = BatchComposer(template, dropon,
                             mj.ALIGN_BOTTOM | mj.ALIGN_RIGHT, -32, -32)

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=max(2, os.cpu_count() or 2))

    half = max(1, BATCH // 2)

    def pipeline():
        # software pipeline: the device composes one half-batch while the
        # host codec (GIL-releasing C++) works on the other
        total = 0
        imgs1 = list(pool.map(codec.decode, jpegs[:half]))
        pend1 = composer.compose_images_async(imgs1)
        imgs2 = list(pool.map(codec.decode, jpegs[half:]))
        composer.finish(pend1, imgs1)
        pend2 = composer.compose_images_async(imgs2)
        sizes1 = pool.map(
            lambda im: len(codec.encode(im, restart_interval=RESTART)), imgs1)
        total += sum(sizes1)
        composer.finish(pend2, imgs2)
        sizes2 = pool.map(
            lambda im: len(codec.encode(im, restart_interval=RESTART)), imgs2)
        return total + sum(sizes2)

    pipeline()  # warmup: compile + codec caches

    t0 = time.perf_counter()
    for _ in range(ITERS):
        pipeline()
    dt = time.perf_counter() - t0

    mp = W * H / 1e6 * BATCH * ITERS
    mps = mp / dt
    print(json.dumps({
        "metric": "composited_megapixels_per_s_per_chip",
        "value": round(mps, 2),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
