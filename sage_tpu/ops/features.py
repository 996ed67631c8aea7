"""PSM feature record and exact host-side score math.

The device kernels (sage_tpu.ops.search) return integer/structural results
(matched counts, matched peak indices). This module assembles the final
Feature records with the reference engine's exact arithmetic:
f64 hyperscore / Poisson (scoring.rs:169-201, 498-527 in the reference),
sequential-f32 intensity sums, and the f32 delta-mass formula.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import numpy as np

F32 = np.float32

SAGE_HYPERSCORE = "SageHyperScore"
OPENMS_HYPERSCORE = "OpenMSHyperScore"

LN_10 = math.log(10.0)


def lnfact(n: int) -> float:
    """Stirling's approximation for ln(n!) — note the reference's quirk that
    n == 0 maps to 1.0, not 0.0 (scoring.rs:169-177)."""
    if n == 0:
        return 1.0
    n = float(n)
    return n * math.log(n) - n + 0.5 * math.log(n) + 0.5 * math.log(math.pi * 2.0 * n)


def lnfact_vec(n: np.ndarray) -> np.ndarray:
    """Vectorized lnfact with the same n == 0 -> 1.0 quirk."""
    n = np.asarray(n, dtype=np.float64)
    safe = np.maximum(n, 1.0)
    ln = np.log(safe)
    out = safe * ln - safe + 0.5 * ln + 0.5 * np.log(np.pi * 2.0 * safe)
    return np.where(n == 0, 1.0, out)


def hyperscore_vec(score_type, matched_b, matched_y, summed_b, summed_y) -> np.ndarray:
    """Vectorized f64 hyperscore, identical arithmetic to ``hyperscore``
    (scoring.rs:179-201): f32 pre-sums, f64 log/lnfact, non-finite -> 255."""
    mb = np.asarray(matched_b)
    my = np.asarray(matched_y)
    sb = np.asarray(summed_b, dtype=np.float32)
    sy = np.asarray(summed_y, dtype=np.float32)
    if score_type == OPENMS_HYPERSCORE:
        summed = (sb + sy).astype(np.float32)
        # the scalar reference path computes log1p on the f32 value
        score = np.log1p(summed).astype(np.float64) + lnfact_vec(mb) + lnfact_vec(my)
    else:
        i = (sb + np.float32(1.0)).astype(np.float64) * (sy + np.float32(1.0)).astype(
            np.float64
        )
        with np.errstate(divide="ignore"):
            score = np.where(i > 0, np.log(np.where(i > 0, i, 1.0)), -np.inf)
        score = score + lnfact_vec(mb) + lnfact_vec(my)
    return np.where(np.isfinite(score), score, 255.0)


def hyperscore(
    score_type: str, matched_b: int, matched_y: int, summed_b: float, summed_y: float
) -> float:
    """X!Tandem-style hyperscore in f64 (scoring.rs:179-201)."""
    return float(
        hyperscore_vec(
            score_type,
            np.asarray([matched_b]),
            np.asarray([matched_y]),
            np.asarray([summed_b], dtype=np.float32),
            np.asarray([summed_y], dtype=np.float32),
        )[0]
    )


def log10_poisson(lam: float, k: int) -> float:
    """Poisson log10 PMF, computed in log space (scoring.rs:522-527)."""
    if lam <= 0:
        return float("-inf")
    val = (k * math.log(lam) - lam - lnfact(k)) / LN_10
    return val if math.isfinite(val) else float("-inf")


@dataclasses.dataclass
class Fragments:
    """Matched fragment annotations (scoring.rs:152-161)."""

    charges: List[int] = dataclasses.field(default_factory=list)
    kinds: List[str] = dataclasses.field(default_factory=list)
    fragment_ordinals: List[int] = dataclasses.field(default_factory=list)
    intensities: List[float] = dataclasses.field(default_factory=list)
    mz_calculated: List[float] = dataclasses.field(default_factory=list)
    mz_experimental: List[float] = dataclasses.field(default_factory=list)


def log10_poisson_vec(lam: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Vectorized Poisson log10 PMF (scoring.rs:522-527)."""
    lam = np.asarray(lam, dtype=np.float64)
    k = np.asarray(k, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        val = (k * np.log(lam) - lam - lnfact_vec(k)) / LN_10
    return np.where((lam > 0) & np.isfinite(val), val, -np.inf)


# Columnar PSM fields: (name, dtype, default). The SoA layout is the
# device-native form of the reference's Vec<Feature> (scoring.rs:69-149) —
# every downstream stage (LDA, KDE, FDR, quant, output writers) consumes
# whole columns.
FEATURE_COLUMNS = (
    ("peptide_idx", np.int32, 0),
    ("psm_id", np.int64, 0),
    ("peptide_len", np.int32, 0),
    ("spec_idx", np.int32, 0),  # index into the batch's spec_ids list
    ("file_id", np.int32, 0),
    ("rank", np.int32, 0),
    ("label", np.int32, 1),
    ("expmass", np.float32, 0.0),
    ("calcmass", np.float32, 0.0),
    ("charge", np.int32, 0),
    ("rt", np.float32, 0.0),
    ("aligned_rt", np.float32, 0.0),
    ("predicted_rt", np.float32, 0.0),
    ("delta_rt_model", np.float32, 0.999),
    ("ims", np.float32, 0.0),
    ("predicted_ims", np.float32, 0.0),
    ("delta_ims_model", np.float32, 0.999),
    ("delta_mass", np.float32, 0.0),
    ("isotope_error", np.float32, 0.0),
    ("average_ppm", np.float32, 0.0),
    ("hyperscore", np.float64, 0.0),
    ("delta_next", np.float64, 0.0),
    ("delta_best", np.float64, 0.0),
    ("matched_peaks", np.int32, 0),
    ("longest_b", np.int32, 0),
    ("longest_y", np.int32, 0),
    ("longest_y_pct", np.float32, 0.0),
    ("missed_cleavages", np.int32, 0),
    ("matched_intensity_pct", np.float32, 0.0),
    ("scored_candidates", np.int32, 0),
    ("poisson", np.float64, 0.0),
    ("discriminant_score", np.float64, 0.0),
    ("posterior_error", np.float64, 1.0),
    ("spectrum_q", np.float64, 1.0),
    ("peptide_q", np.float64, 1.0),
    ("protein_q", np.float64, 1.0),
    ("protein_group_q", np.float64, 1.0),
    ("ms2_intensity", np.float32, 0.0),
    ("num_protein_groups", np.int32, 0),
)


@dataclasses.dataclass
class FeatureTable:
    """Struct-of-arrays PSM table. ``spec_ids`` maps spec_idx -> native
    spectrum id string; ``protein_groups`` is a parallel list of
    Optional[str] (filled by protein grouping); ``fragments`` parallel
    Optional[Fragments] when annotation is on."""

    columns: dict
    spec_ids: List[str]
    protein_groups: Optional[list] = None
    fragments: Optional[list] = None

    def __post_init__(self):
        if self.protein_groups is None:
            self.protein_groups = [None] * len(self)
        if self.fragments is None:
            self.fragments = [None] * len(self)

    def __len__(self) -> int:
        return int(self.columns["psm_id"].shape[0])

    def __getattr__(self, name):
        cols = object.__getattribute__(self, "columns")
        if name in cols:
            return cols[name]
        raise AttributeError(name)

    @staticmethod
    def empty(n: int = 0) -> "FeatureTable":
        return FeatureTable(
            columns={
                name: np.full(n, default, dtype=dt)
                for name, dt, default in FEATURE_COLUMNS
            },
            spec_ids=[],
        )

    @staticmethod
    def concat(tables: List["FeatureTable"]) -> "FeatureTable":
        tables = [t for t in tables if len(t) >= 0]
        if not tables:
            return FeatureTable.empty()
        # re-base spec_idx into the concatenated spec_ids list
        spec_ids: List[str] = []
        cols = {name: [] for name, _, _ in FEATURE_COLUMNS}
        pgs: list = []
        frs: list = []
        for t in tables:
            off = len(spec_ids)
            for name, _, _ in FEATURE_COLUMNS:
                v = t.columns[name]
                cols[name].append(v + off if name == "spec_idx" else v)
            spec_ids.extend(t.spec_ids)
            pgs.extend(t.protein_groups)
            frs.extend(t.fragments)
        return FeatureTable(
            columns={k: np.concatenate(v) for k, v in cols.items()},
            spec_ids=spec_ids,
            protein_groups=pgs,
            fragments=frs,
        )

    def select(self, idx: np.ndarray) -> "FeatureTable":
        return FeatureTable(
            columns={k: v[idx] for k, v in self.columns.items()},
            spec_ids=self.spec_ids,
            protein_groups=[self.protein_groups[i] for i in idx],
            fragments=[self.fragments[i] for i in idx],
        )

    def to_features(self) -> "List[Feature]":
        """Row-wise view as Feature objects (tests / small outputs only)."""
        out = []
        cols = self.columns
        names = [name for name, _, _ in FEATURE_COLUMNS]
        for i in range(len(self)):
            f = Feature(**{n: cols[n][i].item() for n in names if n != "spec_idx"})
            f.spec_id = self.spec_ids[cols["spec_idx"][i]] if self.spec_ids else ""
            f.protein_groups = self.protein_groups[i]
            f.fragments = self.fragments[i]
            out.append(f)
        return out


@dataclasses.dataclass
class Feature:
    """One peptide-spectrum match — the 48-field output record
    (scoring.rs:69-149)."""

    peptide_idx: int = 0
    psm_id: int = 0
    peptide_len: int = 0
    spec_id: str = ""
    file_id: int = 0
    rank: int = 0
    label: int = 1
    expmass: float = 0.0
    calcmass: float = 0.0
    charge: int = 0
    rt: float = 0.0
    aligned_rt: float = 0.0
    predicted_rt: float = 0.0
    delta_rt_model: float = 0.999
    ims: float = 0.0
    predicted_ims: float = 0.0
    delta_ims_model: float = 0.999
    delta_mass: float = 0.0
    isotope_error: float = 0.0
    average_ppm: float = 0.0
    hyperscore: float = 0.0
    delta_next: float = 0.0
    delta_best: float = 0.0
    matched_peaks: int = 0
    longest_b: int = 0
    longest_y: int = 0
    longest_y_pct: float = 0.0
    missed_cleavages: int = 0
    matched_intensity_pct: float = 0.0
    scored_candidates: int = 0
    poisson: float = 0.0
    discriminant_score: float = 0.0
    posterior_error: float = 1.0
    spectrum_q: float = 1.0
    peptide_q: float = 1.0
    protein_q: float = 1.0
    protein_group_q: float = 1.0
    ms2_intensity: float = 0.0
    protein_groups: Optional[str] = None
    num_protein_groups: int = 0
    fragments: Optional[Fragments] = None
