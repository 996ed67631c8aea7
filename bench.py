"""Benchmark: end-to-end MS2 search throughput (spectra/s) on one chip.

Workload: a synthetic tryptic database (deterministic random proteome) is
searched with batches of synthetic MS2 spectra whose peaks are drawn from
real b/y ion ladders plus noise — the same shape of work as the reference
engine's hot loop (scoring.rs:300-474): preliminary candidate scoring over
the precursor window, top-50 trim, full rescoring, feature assembly.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is value / 10_000 spectra/s — a documented stand-in for
32-core Rust Sage narrow-search throughput (the reference publishes no
in-repo numbers; BASELINE.md records the derivation and the ≥10× target
means vs_baseline ≥ 10 once parity-on-speed is reached).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sage_tpu.chem.enzyme import Digest  # noqa: E402
from sage_tpu.chem.fasta import Fasta  # noqa: E402
from sage_tpu.chem.mass import PROTON, Tolerance  # noqa: E402
from sage_tpu.index.builder import DatabaseParams  # noqa: E402
from sage_tpu.ops.search import Scorer, SearchParams  # noqa: E402
from sage_tpu.spectrum.processor import Precursor, ProcessedSpectrum  # noqa: E402

N_PROTEINS = int(os.environ.get("BENCH_PROTEINS", "200"))
N_SPECTRA = int(os.environ.get("BENCH_SPECTRA", "32768"))
BATCH = int(os.environ.get("BENCH_BATCH", "4096"))
BASELINE_SPECTRA_PER_S = 10_000.0

AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)


def synth_fasta(n_proteins: int, length: int = 360, seed: int = 7) -> str:
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(n_proteins):
        seq = AA[rng.integers(0, len(AA), size=length)].tobytes().decode()
        lines.append(f">sp|BENCH{i:05d}|BENCH{i}_SYN synthetic\n{seq}")
    return "\n".join(lines)


def synth_spectra(db, n_spectra: int, seed: int = 11):
    """Spectra whose peaks are a peptide's b/y ions (plus noise), precursor
    annotated at charge 2 — exercising the real narrow-search path."""
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


def main():
    t0 = time.perf_counter()
    params = DatabaseParams()
    fasta = Fasta.parse(synth_fasta(N_PROTEINS), params.decoy_tag, True)
    db = params.build(fasta)
    t_build = time.perf_counter() - t0

    search = SearchParams(
        precursor_tol=Tolerance("ppm", -20.0, 20.0),
        fragment_tol=Tolerance("ppm", -10.0, 10.0),
    )
    scorer = Scorer(db, search)
    spectra = synth_spectra(db, N_SPECTRA)

    # Warmup: one full streaming pass compiles every (W, Pk, R, N) shape
    # the timed pass will hit (shape-bucketed executables are cached).
    batches = [spectra[i : i + BATCH] for i in range(0, len(spectra), BATCH)]
    n_warm = 0
    for feats in scorer.score_stream(batches):
        n_warm += len(feats)
    assert n_warm, "warmup produced no PSMs"

    # Median of five timed passes: the host<->device tunnel in this
    # environment has multi-10ms latency jitter that can halve a single
    # pass; the median reflects sustained throughput.
    times = []
    n_psms = 0
    for _ in range(5):
        t1 = time.perf_counter()
        n_psms = 0
        for feats in scorer.score_stream(batches):
            n_psms += len(feats)
        times.append(time.perf_counter() - t1)
    dt = sorted(times)[2]
    sps = len(spectra) / dt

    print(
        f"# db: {len(db)} peptides, {db.num_fragments} fragments "
        f"(build {t_build:.1f}s); {len(spectra)} spectra in {dt:.2f}s; "
        f"{n_psms} PSMs",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "search_throughput",
                "value": round(sps, 2),
                "unit": "spectra/s",
                "vs_baseline": round(sps / BASELINE_SPECTRA_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
