"""Native text-parser tests: correctness vs np.loadtxt + speed sanity."""

import time

import numpy as np

from tensorbnn_tpu.io import fast_text


def test_native_builds_and_loads():
    assert fast_text.native_available(), "g++ build of fast_text failed"


def test_matches_loadtxt(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(500, 7)).astype(np.float32)
    p = str(tmp_path / "vals.txt")
    with open(p, "wb") as f:
        np.savetxt(f, data)
    got = fast_text.load_floats(p)
    want = np.loadtxt(p, dtype=np.float32).reshape(-1)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_scientific_notation_and_blank_lines(tmp_path):
    p = str(tmp_path / "mixed.txt")
    with open(p, "w") as f:
        f.write("1.5e-3  -2.25E+2\n\n  7\n-0.5\n")
    got = fast_text.load_floats(p)
    np.testing.assert_allclose(got, [1.5e-3, -225.0, 7.0, -0.5], rtol=1e-6)


def test_missing_file_raises(tmp_path):
    import pytest
    with pytest.raises(FileNotFoundError):
        fast_text.load_floats(str(tmp_path / "nope.txt"))


def test_faster_than_loadtxt(tmp_path):
    if not fast_text.native_available():
        return
    rng = np.random.default_rng(1)
    data = rng.normal(size=(20000, 10))
    p = str(tmp_path / "big.txt")
    with open(p, "wb") as f:
        np.savetxt(f, data)
    fast_text.load_floats(p)  # warm: ensures the .so is built/loaded
    t_native = min(_timed(fast_text.load_floats, p) for _ in range(3))
    t_numpy = min(_timed(np.loadtxt, p) for _ in range(3))
    assert t_native < t_numpy, (t_native, t_numpy)


def _timed(fn, *args):
    t0 = time.perf_counter()
    fn(*args)
    return time.perf_counter() - t0


def test_format_floats_matches_savetxt_bytes():
    """The native formatter is byte-identical to np.savetxt's default
    %.18e format (1-D one value/line, 2-D one row/line), including
    inf/nan/subnormals — streamed and buffered runs must stay
    byte-comparable whichever path wrote them."""
    import io

    rng = np.random.default_rng(0)
    cases = [
        rng.normal(size=(7, 3)) * (10.0 ** rng.integers(
            -200, 200, size=(7, 3))),
        rng.normal(size=13),
        np.array([[0.0, -0.0], [np.inf, -np.inf]]),
        np.array([np.nan, 1e-310]),
        rng.normal(size=(4, 5)).astype(np.float32),
        np.array(3.5),
    ]
    for i, a in enumerate(cases):
        got = fast_text.format_floats(a)
        if got is None:  # no compiler in env: fallback path covers it
            return
        buf = io.BytesIO()
        np.savetxt(buf, np.atleast_1d(a))
        assert got == buf.getvalue(), f"case {i}"


def test_format_floats_roundtrips_through_parser(tmp_path):
    rng = np.random.default_rng(1)
    a = rng.normal(size=(20, 4))
    data = fast_text.format_floats(a)
    if data is None:
        return
    p = tmp_path / "x.txt"
    p.write_bytes(data)
    back = fast_text.load_floats(str(p), dtype=np.float64)
    np.testing.assert_allclose(back.reshape(20, 4), a, rtol=0, atol=0)
