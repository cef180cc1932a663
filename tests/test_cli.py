"""CLI parity tests: same flags, same order semantics as modjpeg."""

import subprocess
import sys

import numpy as np
import pytest

import libmodjpeg_tpu as mj
from libmodjpeg_tpu.cli import main as cli_main
from libmodjpeg_tpu.codec import decode

from conftest import FIXTURE_IMAGES as IMAGES


def run_ours(args):
    return cli_main(list(args))


def test_cli_end_to_end(ref_tools, tmp_path):
    """The README's canonical invocation (config[0] of BASELINE.json)."""
    modjpeg, _ = ref_tools
    ref_out = tmp_path / "ref.jpg"
    our_out = tmp_path / "ours.jpg"
    subprocess.run(
        [modjpeg, "-i", f"{IMAGES}/image.jpg", "-d", f"{IMAGES}/dropon.png",
         "-p", "br", "-o", str(ref_out)], check=True, capture_output=True)
    rc = run_ours(["-i", f"{IMAGES}/image.jpg", "-d", f"{IMAGES}/dropon.png",
                   "-p", "br", "-o", str(our_out)])
    # NOTE argument order differs deliberately: -p before -d matters; keep same
    assert rc == 0
    ref_img = decode(ref_out.read_bytes())
    our_img = decode(our_out.read_bytes())
    # -p AFTER -d means ref composed at default top-left but ours at br —
    # rerun both with matching order instead:
    subprocess.run(
        [modjpeg, "-i", f"{IMAGES}/image.jpg", "-p", "br", "-d",
         f"{IMAGES}/dropon.png", "-o", str(ref_out)], check=True,
        capture_output=True)
    rc = run_ours(["-i", f"{IMAGES}/image.jpg", "-p", "br", "-d",
                   f"{IMAGES}/dropon.png", "-o", str(our_out)])
    assert rc == 0
    ref_img = decode(ref_out.read_bytes())
    our_img = decode(our_out.read_bytes())
    # untouched area: everything except the bottom-right dropon footprint
    img = mj.read_jpeg(f"{IMAGES}/image.jpg")
    d = mj.read_dropon(f"{IMAGES}/dropon.png")
    px, py = img.width - d.width, img.height - d.height
    hf, vf = img.sampling.h_factor, img.sampling.v_factor
    for c, ci in enumerate(img.components):
        r0 = (py // vf) * ci.v_samp
        c0 = (px // hf) * ci.h_samp
        a = ref_img.coefs[c].copy()
        b = our_img.coefs[c].copy()
        a[r0:, c0:] = 0
        b[r0:, c0:] = 0
        np.testing.assert_array_equal(a, b)


def test_cli_order_dependence(tmp_path):
    """-p after -d must not affect the already-applied compose."""
    out1 = tmp_path / "o1.jpg"
    out2 = tmp_path / "o2.jpg"
    assert run_ours(["-i", f"{IMAGES}/image.jpg", "-d", f"{IMAGES}/dropon.png",
                     "-p", "br", "-o", str(out1)]) == 0
    assert run_ours(["-i", f"{IMAGES}/image.jpg", "-d", f"{IMAGES}/dropon.png",
                     "-o", str(out2)]) == 0
    assert out1.read_bytes() == out2.read_bytes()  # -p came too late


def test_cli_multiple_outputs_and_effects(ref_tools, tmp_path):
    modjpeg, _ = ref_tools
    ref1, ref2 = tmp_path / "r1.jpg", tmp_path / "r2.jpg"
    our1, our2 = tmp_path / "u1.jpg", tmp_path / "u2.jpg"
    args_tpl = ["-i", f"{IMAGES}/image.jpg", "-x", "-o", "{A}", "-g", "-o", "{B}"]
    subprocess.run([modjpeg] + [a.replace("{A}", str(ref1)).replace("{B}", str(ref2))
                                for a in args_tpl], check=True, capture_output=True)
    assert run_ours([a.replace("{A}", str(our1)).replace("{B}", str(our2))
                     for a in args_tpl]) == 0
    for rf, uf in ((ref1, our1), (ref2, our2)):
        a = decode(rf.read_bytes())
        b = decode(uf.read_bytes())
        for c in range(3):
            np.testing.assert_array_equal(a.coefs[c], b.coefs[c])


def test_cli_encode_options(tmp_path):
    out = tmp_path / "o.jpg"
    assert run_ours(["-i", f"{IMAGES}/image.jpg", "-P", "-A",
                     "-o", str(out)]) == 0
    img = decode(out.read_bytes())
    assert img.progressive and img.arithmetic


def test_cli_errors(tmp_path, capsys):
    assert run_ours(["-i", "/nonexistent.jpg"]) == 1
    assert "Can't read image" in capsys.readouterr().err
    assert run_ours(["-d", f"{IMAGES}/dropon.png"]) == 1  # no image loaded
    assert run_ours(["-h"]) == 0
