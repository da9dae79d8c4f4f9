"""Native C++ host-side loaders (opticommpy_tpu.native).

The ALIST loader replaces the reference's pure-Python parser
(fec.py:811 readAlist) with a one-pass C++ tokenizer; these tests pin
native-vs-Python agreement and the fallback path.
"""

import os

import numpy as np
import pytest

from opticommpy_tpu import native
from opticommpy_tpu.comm import fec

ALIST_DIR = "/root/reference/optic/comm/ALIST"
SMALL = os.path.join(ALIST_DIR, "LDPC_IEEE_802.11nD2_648b_R12.txt")

needs_alist = pytest.mark.skipif(
    not os.path.exists(SMALL), reason="reference ALIST assets not mounted"
)


def _python_edges(path):
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    n, m = map(int, lines[0].split())
    rows, cols = [], []
    for j, line in enumerate(lines[4 : 4 + n]):
        for entry in map(int, line.split()):
            if entry > 0:
                rows.append(entry - 1)
                cols.append(j)
    return n, m, np.asarray(rows, np.int32), np.asarray(cols, np.int32)


@needs_alist
def test_native_matches_python_parser():
    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    n, m, rows, cols = native.alist_edges(SMALL)
    n2, m2, rows2, cols2 = _python_edges(SMALL)
    assert (n, m) == (n2, m2)
    # same edge set (orderings may differ in principle; sort pairs)
    got = np.lexsort((rows, cols))
    want = np.lexsort((rows2, cols2))
    np.testing.assert_array_equal(rows[got], rows2[want])
    np.testing.assert_array_equal(cols[got], cols2[want])


@needs_alist
def test_read_alist_dense_roundtrip_native():
    H = fec.read_alist(SMALL)
    assert H.shape == (324, 648)
    info = fec.parse_alist(SMALL)
    assert info["n"] == 648 and info["m"] == 324
    assert info["max_col_w"] == int(H.sum(axis=0).max())
    assert info["max_row_w"] == int(H.sum(axis=1).max())


@needs_alist
def test_python_fallback_env_gate(monkeypatch, tmp_path):
    # force the fallback and check identical output
    H_native = fec.read_alist(SMALL)
    monkeypatch.setenv("OPTICOMMPY_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_LIB_TRIED", False)
    H_py = fec.read_alist(SMALL)
    np.testing.assert_array_equal(H_native, H_py)


def test_native_rejects_garbage(tmp_path):
    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    bad = tmp_path / "bad.txt"
    bad.write_text("not an alist\n1 2 x\n")
    assert native.alist_edges(str(bad)) is None
    missing = tmp_path / "missing.txt"
    assert native.alist_edges(str(missing)) is None


def test_native_roundtrip_written_alist(tmp_path):
    rng = np.random.default_rng(3)
    H = (rng.random((24, 48)) < 0.15).astype(np.uint8)
    H[:, H.sum(axis=0) == 0] = 1  # no empty columns (valid alist)
    path = tmp_path / "h.alist"
    fec.write_alist(H, str(path))
    H2 = fec.read_alist(str(path))
    np.testing.assert_array_equal(H, H2)
