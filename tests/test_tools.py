"""Tools tests: converter CLI parity, stats oracle, kernel lab variants."""

import os
import subprocess
import sys

import numpy as np
import pytest

from graphtap_tpu.ingest.io import read_edge_list, write_binary
from graphtap_tpu.tools.converter import main as converter_main
from graphtap_tpu.tools.oracle import state_stats
from graphtap_tpu.tools.kernel_lab import run_variant

RMAT10 = "/root/reference/data/rmat10_1024.bin"


def test_converter_bin_to_text_roundtrip(tmp_path, capsys):
    txt = str(tmp_path / "g.el")
    back = str(tmp_path / "g.bin")
    assert converter_main([RMAT10, txt, "--text-out"]) == 0
    out = capsys.readouterr().out
    assert "Edges: 16384" in out
    assert converter_main([txt, back]) == 0
    r0, c0, _ = read_edge_list(RMAT10)
    r1, c1, _ = read_edge_list(back)
    np.testing.assert_array_equal(r0, r1)
    np.testing.assert_array_equal(c0, c1)


def test_converter_add_weights_and_displacement(tmp_path):
    out = str(tmp_path / "w.bin")
    converter_main([RMAT10, out, "--weights", "add", "--displacement", "1",
                    "--seed", "7"])
    r, c, w = read_edge_list(out, has_weight=True)
    r0, c0, _ = read_edge_list(RMAT10)
    np.testing.assert_array_equal(r, r0 + 1)
    assert w.min() >= 1 and w.max() <= 128


def test_state_stats():
    vals = np.array([1.0, 2.0, 2.0, 3.0, 2147483647.0])
    s = state_stats(vals, 2147483647)
    assert s["count"] == 4
    assert s["mean"] == pytest.approx(2.0)
    assert s["mode"] == 2.0
    assert s["max"] == 3.0


@pytest.mark.parametrize("which", [0, 1, 2])
def test_kernel_lab_variants_agree(which):
    r = run_variant(which, RMAT10, 1024, 5)
    # all variants must produce the same checksum (the reference's
    # cross-format invariant); reference binary prints 314.723 at 5 iters
    assert r["checksum"] == pytest.approx(314.723, abs=2e-3)
    assert r["operations"] == 16384 * 5


def test_kernel_lab_shuffle_variant():
    r = run_variant(3, RMAT10, 1024, 5)
    assert r["checksum"] == pytest.approx(314.723, abs=2e-3)


def test_pr1_two_load():
    from graphtap_tpu.apps.pagerank import run_pagerank_two_load
    import jax.numpy as jnp
    ex = run_pagerank_two_load(RMAT10, 1024, num_iterations=20,
                               value_dtype=jnp.float64)
    total, _ = ex.checksum()
    assert total == pytest.approx(317.0176895329694, rel=1e-9)
