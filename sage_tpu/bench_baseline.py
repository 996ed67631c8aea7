"""CPU baseline measurement support: dump a database + spectra workload to
the binary format consumed by ``native/ref_baseline.c`` (a faithful
single-threaded C re-implementation of the reference Rust engine's hot
search loop — see that file's header for the mirrored ``file:line`` map),
compile it, run it, and parse its JSON result.

The image has no Rust toolchain, so the reference binary itself cannot be
measured here. This supplies the next-best *measured* denominator for
bench.py: single-core C throughput on the identical workload, scaled by
the 32-core target documented in BASELINE.md (runner.rs:315-330 is the
reference's own spectra/s metric; rayon scaling is assumed linear, which
is the generous assumption for the baseline).
"""

from __future__ import annotations

import json
import os
import struct
import subprocess
import sys
from typing import List, Optional, Sequence

import numpy as np

from .chem.mass import PROTON

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native",
                    "ref_baseline.c")

_AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)


def synth_fasta(n_proteins: int, length: int = 360, seed: int = 7) -> str:
    """Deterministic random proteome used by bench.py and the baseline
    parity tests."""
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(n_proteins):
        seq = _AA[rng.integers(0, len(_AA), size=length)].tobytes().decode()
        lines.append(f">sp|BENCH{i:05d}|BENCH{i}_SYN synthetic\n{seq}")
    return "\n".join(lines)


def synth_spectra(db, n_spectra: int, seed: int = 11) -> List:
    """Spectra whose peaks are a peptide's b/y ions (plus noise), precursor
    annotated at charge 2 — exercising the real narrow-search path."""
    from .spectrum.processor import Precursor, ProcessedSpectrum

    rng = np.random.default_rng(seed)
    b, y = db.table.ladders()
    mono = db.table.mono
    lens = db.table.lens
    out = []
    n_pep = len(db)
    for i in range(n_spectra):
        p = int(rng.integers(0, n_pep))
        n = max(int(lens[p]) - 1, 1)
        frags = np.concatenate([b[p, :n], y[p, :n]])
        take = rng.random(frags.shape[0]) < 0.7
        masses = frags[take]
        noise = rng.uniform(150.0, float(mono[p]), size=60).astype(np.float32)
        masses = np.concatenate([masses, noise]).astype(np.float32)
        intens = rng.uniform(1e3, 1e6, size=masses.shape[0]).astype(np.float32)
        order = np.argsort(masses, kind="stable")
        masses, intens = masses[order], intens[order]
        z = 2
        prec_mz = float(np.float32(mono[p]) / z + PROTON)
        out.append(
            ProcessedSpectrum(
                level=2,
                id=f"scan={i}",
                file_id=0,
                scan_start_time=float(i) * 0.01,
                ion_injection_time=1.0,
                precursors=[Precursor(mz=prec_mz, charge=z)],
                masses=masses,
                intensities=intens,
                mobilities=np.zeros(0, np.float32),
                total_ion_current=np.float32(intens.sum()),
            )
        )
    return out


def write_baseline_dump(db, spectra: Sequence, search, path: str,
                        reps: int = 1) -> None:
    """Binary layout (little-endian), matching ref_baseline.c main():
    header:  i64 n_frag, i64 n_buckets, i32 bucket_size, i64 n_pep, i32 L
    arrays:  f32 frag_mz[n_frag]   (bucketed layout, database.rs:301-346)
             u32 frag_pep[n_frag]
             f32 bucket_min[n_buckets]
             f32 mono[n_pep]; f32 nterm[n_pep]; i32 lens[n_pep]
             f32 resmass[n_pep * L]
    params:  i32 prec_kind, f32 prec_lo, f32 prec_hi (kind: 0=ppm, 1=Da),
             i32 frag_kind, f32 frag_lo, f32 frag_hi,
             i32 min_matched_peaks, report_psms, n_spectra, reps
    spectra: per spectrum i32 n_peaks, i32 charge, f32 neutral_precursor,
             f32 masses[n_peaks], f32 intens[n_peaks]
    """
    t = db.table
    kinds = {"ppm": 0, "da": 1}
    if (search.precursor_tol.kind not in kinds
            or search.fragment_tol.kind not in kinds):
        raise ValueError("ref_baseline dump supports ppm/Da tolerances only")
    n_frag = int(db.fragment_mz.shape[0])
    n_buckets = int(db.bucket_min.shape[0])
    with open(path, "wb") as f:
        f.write(struct.pack("<qqiqi", n_frag, n_buckets,
                            int(db.bucket_size), len(db), int(t.max_len)))
        f.write(np.ascontiguousarray(db.fragment_mz, np.float32).tobytes())
        f.write(np.ascontiguousarray(db.fragment_pep, np.uint32).tobytes())
        f.write(np.ascontiguousarray(db.bucket_min, np.float32).tobytes())
        f.write(np.ascontiguousarray(t.mono, np.float32).tobytes())
        f.write(np.ascontiguousarray(t.nterm, np.float32).tobytes())
        f.write(np.ascontiguousarray(t.lens, np.int32).tobytes())
        f.write(np.ascontiguousarray(t.resmass, np.float32).tobytes())
        f.write(struct.pack(
            "<iffiffiiii",
            kinds[search.precursor_tol.kind],
            float(search.precursor_tol.lo), float(search.precursor_tol.hi),
            kinds[search.fragment_tol.kind],
            float(search.fragment_tol.lo), float(search.fragment_tol.hi),
            int(search.min_matched_peaks), int(search.report_psms),
            len(spectra), int(reps),
        ))
        for s in spectra:
            prec = s.precursors[0]
            z = int(prec.charge)
            # f32 op order: (mz - PROTON) * z (scoring.rs:419-421)
            neutral = np.float32(np.float32(prec.mz) - PROTON) * np.float32(z)
            f.write(struct.pack("<iif", int(s.masses.shape[0]), z,
                                float(neutral)))
            f.write(np.ascontiguousarray(s.masses, np.float32).tobytes())
            f.write(np.ascontiguousarray(s.intensities, np.float32).tobytes())


def compile_ref_baseline(out: Optional[str] = None) -> Optional[str]:
    """Compile ref_baseline.c with -O3 (cached on mtime). Returns the
    binary path, or None when no C compiler is available."""
    cache = os.path.join(os.path.expanduser("~"), ".cache", "sage_tpu")
    os.makedirs(cache, exist_ok=True)
    out = out or os.path.join(cache, "ref_baseline")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    for cc in ("cc", "gcc", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-march=native", "-o", out, _SRC, "-lm"],
                capture_output=True, timeout=120,
            )
            if r.returncode == 0:
                return out
            print(f"# ref_baseline: {cc} failed: "
                  f"{r.stderr.decode()[:400]}", file=sys.stderr)
        except FileNotFoundError:
            continue
    return None


def run_ref_baseline(dump_path: str, verbose: bool = False,
                     timeout: float = 1800.0):
    """Run the compiled baseline. Returns the parsed JSON stats dict; with
    ``verbose`` also returns the per-spectrum best-PSM lines
    (spec, pep, matched_b, matched_y, longest_b, longest_y, hyperscore)."""
    exe = compile_ref_baseline()
    if exe is None:
        return None
    args = [exe, dump_path] + (["-v"] if verbose else [])
    r = subprocess.run(args, capture_output=True, timeout=timeout)
    if r.returncode != 0:
        raise RuntimeError(f"ref_baseline failed: {r.stderr.decode()[:400]}")
    lines = r.stdout.decode().strip().splitlines()
    stats = json.loads(lines[-1])
    if not verbose:
        return stats
    rows = [line.split() for line in lines[:-1]]
    per_spec = [
        (int(a), int(b), int(mb), int(my), int(lb), int(ly), float(hs))
        for a, b, mb, my, lb, ly, hs in rows
    ]
    return stats, per_spec


def measure_cpu_baseline(db, spectra, search, reps: int = 1,
                         dump_path: Optional[str] = None):
    """Measured single-core spectra/s of the reference algorithm in C on
    this host, over exactly the given workload. Returns the stats dict or
    None if no compiler."""
    import tempfile

    if dump_path is None:
        fd, dump_path = tempfile.mkstemp(suffix=".bin", prefix="sage_base_")
        os.close(fd)
        cleanup = True
    else:
        cleanup = False
    try:
        write_baseline_dump(db, spectra, search, dump_path, reps=reps)
        return run_ref_baseline(dump_path)
    finally:
        if cleanup:
            try:
                os.unlink(dump_path)
            except OSError:
                pass
