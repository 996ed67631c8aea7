import numpy as np

from sage_tpu.chem.mass import (
    MONOISOTOPIC_MASSES,
    VALID_AA,
    Tolerance,
    monoisotopic,
)


def test_all_valid_aa_have_mass():
    # mass.rs:136-141
    for aa in VALID_AA:
        assert monoisotopic(aa) > 0.0


def test_tolerance_bounds_golden():
    # mass.rs:143-157 — exact f32 values
    lo, hi = Tolerance("ppm", -10.0, 20.0).bounds(np.float32(1000.0))
    assert (np.float32(lo), np.float32(hi)) == (np.float32(999.99), np.float32(1000.02))

    lo, hi = Tolerance("ppm", -10.0, 10.0).bounds(np.float32(487.0))
    assert (np.float32(lo), np.float32(hi)) == (np.float32(486.99513), np.float32(487.00487))

    lo, hi = Tolerance("ppm", -50.0, 50.0).bounds(np.float32(1000.0))
    assert (np.float32(lo), np.float32(hi)) == (np.float32(999.95), np.float32(1000.05))


def test_tolerance_da():
    lo, hi = Tolerance("da", -1.5, 2.5).bounds(np.float32(100.0))
    assert lo == np.float32(98.5) and hi == np.float32(102.5)


def test_tolerance_json_roundtrip():
    t = Tolerance.from_json({"ppm": [-10, 10]})
    assert t.kind == "ppm" and t.lo == -10 and t.hi == 10


def test_vectorized_bounds_match_scalar():
    t = Tolerance("ppm", -50.0, 50.0)
    centers = np.array([150.0, 643.2, 1999.9], dtype=np.float32)
    lo_v, hi_v = t.bounds(centers)
    for i, c in enumerate(centers):
        lo_s, hi_s = t.bounds(np.float32(c))
        assert lo_v[i] == lo_s and hi_v[i] == hi_s


def test_monoisotopic_table_values():
    assert MONOISOTOPIC_MASSES[ord("G") - 65] == np.float32(57.02146)
    assert MONOISOTOPIC_MASSES[ord("W") - 65] == np.float32(186.07932)
    # I and L are isobaric
    assert MONOISOTOPIC_MASSES[ord("I") - 65] == MONOISOTOPIC_MASSES[ord("L") - 65]
