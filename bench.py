"""Benchmark: end-to-end MS2 search throughput (spectra/s) on one chip,
at production scale, against a *measured* CPU baseline.

Workload: a synthetic tryptic database at human-proteome scale (~889k
peptides / 19M fragments by default — the same regime as the reference's
published benchmark configs, figures/benchmark_params/{open,tmt}.json) is
searched with batches of synthetic MS2 spectra whose peaks are drawn from
real b/y ion ladders plus noise — the same shape of work as the reference
engine's hot loop (scoring.rs:300-474).

Baseline: the image has no Rust toolchain, so the reference binary cannot
be run. Instead ``sage_tpu/native/ref_baseline.c`` — a faithful C
re-implementation of the reference's exact hot loop and data layout,
PSM-parity-tested against this engine in tests/test_ref_baseline.py — is
compiled and timed single-core on the *same workload*, and scaled by
BASELINE_CORES (default 32, per BASELINE.md's "32-core Rust Sage" target;
rayon scaling assumed linear, the generous assumption for the baseline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}
where ``value`` is narrow-search spectra/s at production scale and
``vs_baseline`` = value / (measured single-core C spectra/s x 32).
Extra keys record the open-search rate, the measured baselines, and the
device-fetch wait (the host<->TPU tunnel tax) so device time and
transfer stalls can be told apart. The same numbers are written to
BASELINE_MEASURED.json for the record.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sage_tpu.bench_baseline import (  # noqa: E402
    measure_cpu_baseline,
    synth_fasta,
    synth_spectra,
)
from sage_tpu.chem.fasta import Fasta  # noqa: E402
from sage_tpu.chem.mass import Tolerance  # noqa: E402
from sage_tpu.index.builder import (  # noqa: E402
    DatabaseParams,
    load_database,
    save_database,
)
from sage_tpu.ops import search as search_mod  # noqa: E402
from sage_tpu.ops.search import Scorer, SearchParams  # noqa: E402

N_PROTEINS = int(os.environ.get("BENCH_PROTEINS", "20000"))
N_SPECTRA = int(os.environ.get("BENCH_SPECTRA", "8192"))
N_SPECTRA_OPEN = int(os.environ.get("BENCH_SPECTRA_OPEN", "2048"))
BATCH = int(os.environ.get("BENCH_BATCH", "4096"))
BATCH_OPEN = int(os.environ.get("BENCH_BATCH_OPEN", "512"))
PASSES = int(os.environ.get("BENCH_PASSES", "5"))
BASELINE_CORES = int(os.environ.get("BASELINE_CORES", "32"))
SKIP_OPEN = os.environ.get("BENCH_SKIP_OPEN") == "1"


def build_db():
    """Build (or load from the /tmp cache) the benchmark database."""
    cache = f"/tmp/sage_bench_db_{N_PROTEINS}.npz"
    params = DatabaseParams()
    t0 = time.perf_counter()
    if os.path.exists(cache):
        try:
            db = load_database(cache)
            return db, time.perf_counter() - t0
        except Exception as e:  # stale/corrupt cache
            print(f"# bench db cache reload failed: {e}", file=sys.stderr)
    fasta = Fasta.parse(synth_fasta(N_PROTEINS), params.decoy_tag, True)
    db = params.build(fasta)
    try:
        save_database(db, cache)
    except Exception as e:
        print(f"# bench db cache save failed: {e}", file=sys.stderr)
    return db, time.perf_counter() - t0


def timed_passes(scorer, spectra, batch, passes):
    """Median-of-N timed streaming passes (the tunnel jitter in this
    environment can halve a single pass). Returns (median_s, psms,
    fetch_wait_s_per_pass)."""
    batches = [spectra[i : i + batch] for i in range(0, len(spectra), batch)]
    # Warmup: compiles every shape the timed passes hit.
    t_w = time.perf_counter()
    n_warm = 0
    for feats in scorer.score_stream(batches):
        n_warm += len(feats)
    assert n_warm, "warmup produced no PSMs"
    warm_s = time.perf_counter() - t_w
    if warm_s > 240:
        # remote compiles hit a bad tunnel phase; fewer timed passes
        # keep the whole bench inside the driver's patience
        print(f"# slow warmup ({warm_s:.0f}s): reducing passes",
              file=sys.stderr)
        passes = max(min(passes, 2), 1)
    times = []
    n_psms = 0
    search_mod.reset_fetch_wait()
    for _ in range(passes):
        t1 = time.perf_counter()
        n_psms = 0
        for feats in scorer.score_stream(batches):
            n_psms += len(feats)
        times.append(time.perf_counter() - t1)
    fetch_wait = search_mod.get_fetch_wait() / passes
    return (
        sorted(times)[len(times) // 2], n_psms, fetch_wait, min(times),
    )


def main():
    db, t_build = build_db()
    print(
        f"# db: {len(db)} peptides, {db.num_fragments} fragments "
        f"(build/load {t_build:.1f}s)",
        file=sys.stderr,
    )
    frag_tol = Tolerance("ppm", -10.0, 10.0)
    narrow = SearchParams(
        precursor_tol=Tolerance("ppm", -20.0, 20.0), fragment_tol=frag_tol
    )
    spectra = synth_spectra(db, max(N_SPECTRA, N_SPECTRA_OPEN))

    # --- measured CPU baseline (single core, same workload) ---
    base_narrow = measure_cpu_baseline(db, spectra[:512], narrow, reps=4)
    b1 = base_narrow["spectra_per_s"] if base_narrow else None
    print(f"# baseline narrow 1-core: {base_narrow}", file=sys.stderr)

    # --- TPU narrow search (headline) ---
    scorer = Scorer(db, narrow)
    dt, n_psms, fetch_wait, dt_best = timed_passes(
        scorer, spectra[:N_SPECTRA], BATCH, PASSES
    )
    sps = N_SPECTRA / dt
    print(
        f"# narrow: {N_SPECTRA} spectra in {dt:.2f}s ({sps:.0f} sp/s, "
        f"best pass {N_SPECTRA / dt_best:.0f}), "
        f"{n_psms} PSMs, fetch-wait {fetch_wait:.2f}s/pass",
        file=sys.stderr,
    )

    result = {
        "metric": "search_throughput",
        "value": round(sps, 2),
        "unit": "spectra/s",
        "db_peptides": len(db),
        "db_fragments": int(db.num_fragments),
        "fetch_wait_s_per_pass": round(fetch_wait, 3),
        "wall_s_per_pass": round(dt, 3),
        # best pass: the host<->TPU tunnel in this environment has
        # multi-minute phase drift; the median-best spread bounds it
        "value_best_pass": round(N_SPECTRA / dt_best, 2),
        "baseline_cores": BASELINE_CORES,
    }
    if b1:
        result["baseline_narrow_1core"] = round(b1, 1)
        result["vs_baseline"] = round(sps / (b1 * BASELINE_CORES), 4)
        result["vs_baseline_1core"] = round(sps / b1, 3)
    else:
        # no C compiler: fall back to the round-1 documented stand-in
        result["vs_baseline"] = round(sps / 10_000.0, 4)
        result["baseline_note"] = "no C compiler; 10k sp/s stand-in"

    # --- open search (the reference's flagship benchmark regime) ---
    if not SKIP_OPEN:
        open_params = SearchParams(
            precursor_tol=Tolerance("da", -500.0, 100.0),
            fragment_tol=frag_tol,
        )
        base_open = measure_cpu_baseline(
            db, spectra[:128], open_params, reps=1
        )
        print(f"# baseline open 1-core: {base_open}", file=sys.stderr)
        oscorer = Scorer(db, open_params)
        odt, o_psms, o_fetch, odt_best = timed_passes(
            oscorer, spectra[:N_SPECTRA_OPEN], BATCH_OPEN, max(PASSES - 2, 1)
        )
        osps = N_SPECTRA_OPEN / odt
        print(
            f"# open: {N_SPECTRA_OPEN} spectra in {odt:.2f}s "
            f"({osps:.0f} sp/s, best pass {N_SPECTRA_OPEN / odt_best:.0f}), "
            f"{o_psms} PSMs, fetch-wait {o_fetch:.2f}s/pass",
            file=sys.stderr,
        )
        result["open_sps"] = round(osps, 2)
        result["open_sps_best_pass"] = round(N_SPECTRA_OPEN / odt_best, 2)
        result["open_fetch_wait_s_per_pass"] = round(o_fetch, 3)
        if base_open:
            ob1 = base_open["spectra_per_s"]
            result["baseline_open_1core"] = round(ob1, 1)
            result["open_vs_baseline"] = round(
                osps / (ob1 * BASELINE_CORES), 4
            )
            result["open_vs_baseline_1core"] = round(osps / ob1, 3)

    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BASELINE_MEASURED.json"), "w"
        ) as f:
            json.dump(result, f, indent=1)
    except OSError:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
