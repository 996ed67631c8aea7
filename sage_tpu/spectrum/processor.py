"""Spectrum model and processing: raw parser output -> neutral-mass peak
lists ready for batching onto the device.

Parity with /root/reference/crates/sage/src/spectrum.rs: every experimental
peak is converted to a neutral mass ``(mz - PROTON) * charge`` (charge = 1
unless deisotoping assigned one), MS2 spectra keep only the top-N most
intense peaks, and the output is a struct-of-arrays sorted by mass.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..chem.mass import PROTON, Tolerance
from ..index.builder import binary_search_slice
from ..native import deisotope as native_deisotope

F32 = np.float32


@dataclasses.dataclass
class Precursor:
    """spectrum.rs:46-55."""

    mz: float = 0.0
    intensity: Optional[float] = None
    charge: Optional[int] = None
    spectrum_ref: Optional[str] = None
    isolation_window: Optional[Tolerance] = None
    inverse_ion_mobility: Optional[float] = None


@dataclasses.dataclass
class RawSpectrum:
    """Unprocessed spectrum as returned by a parser (spectrum.rs:81-106)."""

    file_id: int = 0
    ms_level: int = 0
    id: str = ""
    precursors: List[Precursor] = dataclasses.field(default_factory=list)
    centroid: bool = False  # Representation::{Profile,Centroid}
    scan_start_time: float = 0.0
    ion_injection_time: float = 0.0
    total_ion_current: float = 0.0
    mz: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.float32))
    intensity: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.float32))
    mobility: Optional[np.ndarray] = None


@dataclasses.dataclass
class ProcessedSpectrum:
    """SoA spectrum with neutral masses sorted ascending (spectrum.rs:57-79)."""

    level: int
    id: str
    file_id: int
    scan_start_time: float
    ion_injection_time: float
    precursors: List[Precursor]
    masses: np.ndarray  # f32, ascending
    intensities: np.ndarray  # f32, parallel
    mobilities: np.ndarray  # f32, parallel (empty unless IMS)
    total_ion_current: np.float32

    def __len__(self) -> int:
        return int(self.masses.shape[0])

    def extract_ms1_precursor(self):
        """(neutral mass, charge) of the first precursor (spectrum.rs:250-255)."""
        if not self.precursors:
            return None
        p = self.precursors[0]
        if p.charge is None:
            return None
        return (F32(F32(p.mz) - PROTON) * F32(p.charge), p.charge)

    def in_isolation_window(self, mz: float) -> Optional[bool]:
        if not self.precursors:
            return None
        p = self.precursors[0]
        if p.isolation_window is None:
            return None
        lo, hi = p.isolation_window.bounds(F32(F32(p.mz) - PROTON))
        return bool(lo <= mz <= hi)


def select_most_intense_peak(
    masses: np.ndarray,
    intensities: np.ndarray,
    center: np.float32,
    tolerance: Tolerance,
    offset: Optional[float] = None,
) -> Optional[int]:
    """Most intense peak within the tolerance window of ``center``; ties go to
    the later index (spectrum.rs:134-159). The optional ``offset`` shifts the
    window (used for TMT reporter parity)."""
    lo, hi = tolerance.bounds(center)
    if offset is not None:
        lo = F32(lo + F32(offset))
        hi = F32(hi + F32(offset))
    i, j = binary_search_slice(masses, lo, hi)
    best = None
    max_int = F32(0.0)
    for idx in range(i, j):
        if lo <= masses[idx] <= hi and intensities[idx] >= max_int:
            max_int = intensities[idx]
            best = idx
    return best


class SpectrumProcessor:
    """spectrum.rs:263-413."""

    def __init__(self, take_top_n: int, deisotope: bool, min_deisotope_mz: float = 0.0):
        self.take_top_n = take_top_n
        self.deisotope = deisotope
        self.min_deisotope_mz = min_deisotope_mz

    def _process_ms2(self, spectrum: RawSpectrum):
        if not spectrum.centroid:
            raise ValueError(
                f"Scan {spectrum.id} contains profile data! Please convert to centroid"
            )
        charge = 3
        if spectrum.precursors and spectrum.precursors[0].charge is not None:
            charge = spectrum.precursors[0].charge

        mz = np.asarray(spectrum.mz, dtype=np.float32)
        inten = np.asarray(spectrum.intensity, dtype=np.float32)

        if self.deisotope:
            env_int, env_charge, env_parent = native_deisotope(
                mz, inten, charge, 10.0, self.min_deisotope_mz
            )
            # Sort by intensity desc then m/z asc (spectrum.rs:303-307)
            order = np.lexsort((mz, -env_int))
            keep = order[env_parent[order] < 0]
            z = np.where(env_charge[keep] > 0, env_charge[keep], 1).astype(np.float32)
            mass = ((mz[keep] - PROTON) * z).astype(np.float32)
            intensity = env_int[keep]
            mass = mass[: self.take_top_n]
            intensity = intensity[: self.take_top_n]
        else:
            mass = ((mz - PROTON) * F32(1.0)).astype(np.float32)
            intensity = inten
            if mass.shape[0] > self.take_top_n:
                # Top-N by (intensity, mass) — heap.rs k-select semantics
                order = np.lexsort((mass, intensity))[::-1][: self.take_top_n]
                mass = mass[order]
                intensity = intensity[order]
        return mass, intensity

    def process(self, spectrum: RawSpectrum) -> ProcessedSpectrum:
        # MS1 + ion mobility: sort three parallel columns by neutral mass
        # (spectrum.rs:344-378)
        if spectrum.ms_level == 1 and spectrum.mobility is not None:
            mass = (np.asarray(spectrum.mz, np.float32) - PROTON).astype(np.float32)
            inten = np.asarray(spectrum.intensity, np.float32)
            mob = np.asarray(spectrum.mobility, np.float32)
            order = np.argsort(mass, kind="stable")
            mass, inten, mob = mass[order], inten[order], mob[order]
            from ..native import seq_f32_sum

            return ProcessedSpectrum(
                level=spectrum.ms_level,
                id=spectrum.id,
                file_id=spectrum.file_id,
                scan_start_time=spectrum.scan_start_time,
                ion_injection_time=spectrum.ion_injection_time,
                precursors=spectrum.precursors,
                masses=mass,
                intensities=inten,
                mobilities=mob,
                total_ion_current=seq_f32_sum(inten),
            )

        if spectrum.ms_level == 2:
            mass, intensity = self._process_ms2(spectrum)
        else:
            mass = ((np.asarray(spectrum.mz, np.float32) - PROTON) * F32(1.0)).astype(np.float32)
            intensity = np.asarray(spectrum.intensity, np.float32)

        order = np.argsort(mass, kind="stable")
        mass = mass[order]
        intensity = intensity[order]
        from ..native import seq_f32_sum

        return ProcessedSpectrum(
            level=spectrum.ms_level,
            id=spectrum.id,
            file_id=spectrum.file_id,
            scan_start_time=spectrum.scan_start_time,
            ion_injection_time=spectrum.ion_injection_time,
            precursors=spectrum.precursors,
            masses=mass,
            intensities=intensity,
            mobilities=np.zeros(0, np.float32),
            total_ion_current=seq_f32_sum(intensity),
        )
