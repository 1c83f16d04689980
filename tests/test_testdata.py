"""Data-generation utilities (utils/testdata.py): reference-equivalent
fields and PGM conversion (test_data/generate.cpp, pgm2float.cpp)."""

import io
import os

import numpy as np

from sperr_tpu.utils import testdata as td


def test_ball_fields_match_reference_semantics():
    b2 = td.ball_field_2d(100)
    assert b2.shape == (100, 100) and b2.dtype == np.float32
    assert b2[50, 50] == 1.0  # singular center clamped (generate.cpp)
    assert np.isfinite(b2).all()
    # 1/r at distance 1 from center
    np.testing.assert_allclose(b2[50, 51], 1.0)
    np.testing.assert_allclose(b2[50, 52], 0.5)

    b3 = td.ball_field_3d(20)
    assert b3.shape == (20, 20, 20) and np.isfinite(b3).all()
    assert b3[10, 10, 10] == 1.0
    np.testing.assert_allclose(b3[10, 10, 11], 1.0)


def test_smooth_field_matches_bench_volume():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "benchmod",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    a = td.smooth_field_3d(32)
    b = bench.make_volume(32)
    np.testing.assert_array_equal(a, b)


def test_pgm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (13, 17), dtype=np.uint8)
    p = tmp_path / "t.pgm"
    with open(p, "wb") as f:
        f.write(b"P5\n# a comment\n17 13\n255\n")
        f.write(img.tobytes())
    out = td.pgm_to_float(str(p))
    np.testing.assert_array_equal(out, img.astype(np.float32))


def test_cli(tmp_path):
    out = tmp_path / "ball.bin"
    assert td.main(["ball3d", "10", str(out)]) == 0
    data = np.fromfile(out, dtype=np.float32)
    assert data.size == 1000
    # a generated field roundtrips through the codec within the bound
    from sperr_tpu.codec.speck_flt import SpeckFloatCodec

    c = SpeckFloatCodec(3, (10, 10, 10))
    s = c.compress(data.astype(np.float64), "pwe", 1e-3)
    rec, _ = c.decompress(bytes(s))
    assert np.abs(rec - data).max() <= 1e-3
