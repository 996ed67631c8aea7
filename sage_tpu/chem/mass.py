"""Mass and chemistry constants.

Behavioral parity with the reference engine's mass module
(/root/reference/crates/sage/src/mass.rs:1-158): monoisotopic amino-acid
masses, water/proton/neutron/ammonia constants, tolerance windows, and
elemental composition (carbon / sulfur counts) used for isotope envelopes.

All masses are float32 — the entire engine operates in f32 like the
reference, and window-boundary comparisons are bit-exact only if every
intermediate op is performed in f32 with the same operation order.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

F32 = np.float32

H2O = F32(18.010565)
PROTON = F32(1.0072764)
NEUTRON = F32(1.00335)
NH3 = F32(17.026548)

# The 22 valid amino acids (includes U = selenocysteine, O = pyrrolysine).
# mass.rs:59-62
VALID_AA = b"ACDEFGHIKLMNPQRSTVWYUO"

# Monoisotopic residue masses indexed by (ascii - ord('A')); invalid letters
# (B, J, X, Z) map to 0.0.  mass.rs:64-68
MONOISOTOPIC_MASSES = np.array(
    [
        71.03711,   # A
        0.0,        # B
        103.00919,  # C
        115.02694,  # D
        129.04259,  # E
        147.0684,   # F
        57.02146,   # G
        137.05891,  # H
        113.08406,  # I
        0.0,        # J
        128.09496,  # K
        113.08406,  # L
        131.0405,   # M
        114.04293,  # N
        237.14774,  # O (pyrrolysine)
        97.05276,   # P
        128.05858,  # Q
        156.1011,   # R
        87.03203,   # S
        101.04768,  # T
        150.95363,  # U (selenocysteine)
        99.06841,   # V
        186.07932,  # W
        0.0,        # X
        163.06332,  # Y
        0.0,        # Z
    ],
    dtype=np.float32,
)


def monoisotopic(aa: int) -> np.float32:
    """Monoisotopic mass for a single residue byte; 0.0 if unknown.

    mass.rs:70-76
    """
    if 65 <= aa <= 90:  # ascii uppercase
        return MONOISOTOPIC_MASSES[aa - 65]
    return F32(0.0)


# (carbon, sulfur) per residue, used for theoretical isotope envelopes.
# mass.rs:78-104 (oxygen is parsed but unused in the reference as well).
_COMPOSITION_TABLE = {
    ord("A"): (3, 0),
    ord("R"): (6, 0),
    ord("N"): (4, 0),
    ord("D"): (4, 0),
    ord("C"): (3, 1),
    ord("E"): (5, 0),
    ord("Q"): (5, 0),
    ord("G"): (2, 0),
    ord("H"): (6, 0),
    ord("I"): (6, 0),
    ord("L"): (6, 0),
    ord("K"): (6, 0),
    ord("M"): (5, 1),
    ord("F"): (9, 0),
    ord("P"): (5, 0),
    ord("S"): (3, 0),
    ord("T"): (4, 0),
    ord("W"): (11, 0),
    ord("Y"): (9, 0),
    ord("V"): (5, 0),
    ord("U"): (3, 0),
    ord("O"): (12, 0),
}

# Dense lookup tables (index = ascii - ord('A')) for vectorized use.
COMPOSITION_CARBON = np.zeros(26, dtype=np.int32)
COMPOSITION_SULFUR = np.zeros(26, dtype=np.int32)
for _aa, (_c, _s) in _COMPOSITION_TABLE.items():
    COMPOSITION_CARBON[_aa - 65] = _c
    COMPOSITION_SULFUR[_aa - 65] = _s


def composition(aa: int) -> Tuple[int, int]:
    """(carbon, sulfur) counts for a residue byte."""
    return _COMPOSITION_TABLE.get(aa, (0, 0))


@dataclasses.dataclass(frozen=True)
class Tolerance:
    """A mass tolerance window: ppm, pct, or absolute Da.

    ``bounds(center)`` returns the (lo, hi) window in Da computed in f32
    with the reference's exact operation order (mass.rs:21-35):
    ``center + center * lo / 1e6`` for ppm.
    """

    kind: str  # "ppm" | "pct" | "da"
    lo: float
    hi: float

    def bounds(self, center):
        """Window bounds for scalar or ndarray f32 ``center``."""
        center = np.asarray(center, dtype=np.float32)
        lo = F32(self.lo)
        hi = F32(self.hi)
        if self.kind == "ppm":
            scale = F32(1_000_000.0)
            delta_lo = (center * lo) / scale
            delta_hi = (center * hi) / scale
            return center + delta_lo, center + delta_hi
        if self.kind == "pct":
            scale = F32(100.0)
            delta_lo = (center * lo) / scale
            delta_hi = (center * hi) / scale
            return center + delta_lo, center + delta_hi
        if self.kind == "da":
            return center + lo, center + hi
        raise ValueError(f"unknown tolerance kind {self.kind}")

    def contains(self, center, rhs) -> bool:
        lo, hi = self.bounds(center)
        return bool(rhs >= lo) and bool(rhs <= hi)

    def __mul__(self, rhs: float) -> "Tolerance":
        # mass.rs:47-57 — used by wide-window search (isolation window x charge)
        return Tolerance(self.kind, F32(F32(self.lo) * F32(rhs)), F32(F32(self.hi) * F32(rhs)))

    @staticmethod
    def ppm_to_delta_mass(center, ppm):
        # mass.rs:42-44: ppm * center / 1e6
        center = np.asarray(center, dtype=np.float32)
        return (F32(ppm) * center) / F32(1_000_000.0)

    @staticmethod
    def from_json(obj) -> "Tolerance":
        """Parse ``{"ppm": [-10, 10]}`` style config values."""
        if not isinstance(obj, dict) or len(obj) != 1:
            raise ValueError(f"invalid tolerance: {obj!r}")
        kind, (lo, hi) = next(iter(obj.items()))
        kind = kind.lower()
        if kind not in ("ppm", "pct", "da"):
            raise ValueError(f"invalid tolerance kind: {kind}")
        return Tolerance(kind, float(lo), float(hi))

    def to_json(self):
        return {self.kind: [self.lo, self.hi]}
