"""MGF (Mascot Generic Format) parser.

Parity with /root/reference/crates/sage-cloudpath/src/mgf.rs: global
embedded defaults (TOL/TOLU/CHARGE) before the first BEGIN IONS block,
then per-query blocks with TITLE/PEPMASS/CHARGE/TOL/TOLU/RTINSECONDS and
numeric peak lines. A charge list ("2+ and 3+") produces one Precursor
per charge (mgf.rs:86-104); TOL/TOLU become the precursor isolation
window (Da/ppm, symmetric ±|tol|, mgf.rs:72-84). Spectra are MS2 and
centroided by default (mgf.rs:106-113); peaks without an intensity get
1.0 (mgf.rs:295-298); malformed blocks (no id / no precursor / no peaks /
length mismatch) are skipped with a warning (mgf.rs:116-127).
"""

from __future__ import annotations

import gzip
import logging
import re
from typing import List, Optional

import numpy as np

from ..chem.mass import Tolerance
from ..spectrum.processor import Precursor, RawSpectrum

log = logging.getLogger("sage_tpu")

_CHARGE_RE = re.compile(r"(\d)\+?")


def _parse_charges(value: str) -> List[int]:
    # mgf.rs:168-181: every single digit (optionally followed by '+')
    return [int(m.group(0)[0]) for m in _CHARGE_RE.finditer(value)]


def _isolation_window(tol: Optional[float], unit: Optional[str]) -> Optional[Tolerance]:
    # mgf.rs:72-84
    if tol is None or unit is None:
        return None
    if unit == "Da":
        return Tolerance("da", -abs(tol), abs(tol))
    if unit == "ppm":
        return Tolerance("ppm", -abs(tol), abs(tol))
    return None


class _Query:
    __slots__ = (
        "id", "precursors", "tol", "tol_unit", "charges", "rt_minutes",
        "mz", "intensity",
    )

    def __init__(self, tol, tol_unit, charges):
        self.id = ""
        self.precursors: List[Precursor] = []
        self.tol = tol
        self.tol_unit = tol_unit
        self.charges = charges
        self.rt_minutes: Optional[float] = None
        self.mz: List[float] = []
        self.intensity: List[float] = []


def parse_mgf(contents: str, file_id: int = 0) -> List[RawSpectrum]:
    """Parse MGF text into RawSpectrum objects (mgf.rs:333-369)."""
    default_tol: Optional[float] = None
    default_tol_unit: Optional[str] = None
    default_charges: Optional[List[int]] = None

    lines = iter(contents.splitlines())
    # embedded global parameters until the first BEGIN IONS
    started = False
    for line in lines:
        line = line.strip()
        if line.startswith("BEGIN IONS"):
            started = True
            break
        if line.startswith("TOL="):
            try:
                default_tol = float(line[4:])
            except ValueError:
                pass
        elif line.startswith("TOLU="):
            default_tol_unit = line[5:]
        elif line.startswith("CHARGE="):
            default_charges = _parse_charges(line[7:])
    if not started:
        return []

    spectra: List[RawSpectrum] = []
    q = _Query(default_tol, default_tol_unit, default_charges)

    def finish(q: _Query) -> None:
        iso = _isolation_window(q.tol, q.tol_unit)
        precursors: List[Precursor] = []
        for prec in q.precursors:
            prec.isolation_window = iso
            if q.charges:
                for z in q.charges:
                    precursors.append(
                        Precursor(
                            mz=prec.mz, intensity=prec.intensity, charge=z,
                            isolation_window=iso,
                        )
                    )
            else:
                precursors.append(prec)
        spec = RawSpectrum(
            file_id=file_id,
            ms_level=2,
            centroid=True,
            id=q.id,
            precursors=precursors,
            scan_start_time=q.rt_minutes or 0.0,
            total_ion_current=float(np.float32(sum(np.float32(i) for i in q.intensity))),
            mz=np.asarray(q.mz, dtype=np.float32),
            intensity=np.asarray(q.intensity, dtype=np.float32),
        )
        if (
            not spec.id
            or not spec.precursors
            or spec.mz.size == 0
            or spec.mz.size != spec.intensity.size
        ):
            log.warning("malformed MGF query block %r skipped", q.id)
            return
        spectra.append(spec)

    for line in lines:
        line = line.strip()
        if not line:
            continue
        if line[0].isdigit():
            parts = line.split()
            try:
                q.mz.append(float(parts[0]))
            except ValueError:
                log.warning("malformed MGF peak line %r", line)
                continue
            if len(parts) > 1:
                # mgf.rs:289-295: an unparseable intensity pushes nothing,
                # leaving a length mismatch that voids the block
                try:
                    q.intensity.append(float(parts[1]))
                except ValueError:
                    pass
            else:
                q.intensity.append(1.0)
        elif line.startswith("END IONS"):
            finish(q)
            q = _Query(default_tol, default_tol_unit, default_charges)
        elif line.startswith("TITLE="):
            q.id = line[6:]
        elif line.startswith("PEPMASS="):
            parts = line[8:].split()
            prec = Precursor()
            if parts:
                try:
                    prec.mz = float(np.float32(parts[0]))
                except ValueError:
                    log.warning("malformed PEPMASS line %r", line)
                    continue
            if len(parts) > 1:
                try:
                    prec.intensity = float(np.float32(parts[1]))
                except ValueError:
                    pass
            q.precursors.append(prec)
        elif line.startswith("CHARGE="):
            q.charges = _parse_charges(line[7:])
        elif line.startswith("TOL="):
            try:
                q.tol = float(line[4:])
            except ValueError:
                pass
        elif line.startswith("TOLU="):
            q.tol_unit = line[5:]
        elif line.startswith("RTINSECONDS="):
            try:
                q.rt_minutes = float(np.float32(line[12:])) / 60.0
            except ValueError:
                pass
    return spectra


def read_mgf(path: str, file_id: int = 0) -> List[RawSpectrum]:
    if path.endswith(".gz"):
        with gzip.open(path, "rt") as f:
            contents = f.read()
    else:
        with open(path) as f:
            contents = f.read()
    return parse_mgf(contents, file_id=file_id)
