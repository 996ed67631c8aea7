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


def hyperscore(
    score_type: str, matched_b: int, matched_y: int, summed_b: float, summed_y: float
) -> float:
    """X!Tandem-style hyperscore in f64 (scoring.rs:179-201)."""
    if score_type == OPENMS_HYPERSCORE:
        summed = np.float32(np.float32(summed_b) + np.float32(summed_y))
        score = float(np.log1p(summed)) + lnfact(matched_b) + lnfact(matched_y)
    else:
        i = float(np.float32(summed_b + np.float32(1.0))) * float(
            np.float32(summed_y + np.float32(1.0))
        )
        score = math.log(i) if i > 0 else float("-inf")
        score += lnfact(matched_b) + lnfact(matched_y)
    return score if math.isfinite(score) else 255.0


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
