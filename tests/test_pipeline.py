"""End-to-end pipeline test: run the full Runner on the bundled
single-scan mzML with the reference's tests/config.json parameters and
validate the TSV output contract (the analog of the reference's CI run,
.github/workflows/rust.yml:24-33)."""

import json
import os

import numpy as np
import pytest

CONFIG = {
    "database": {
        "bucket_size": 16384,
        "enzyme": {
            "missed_cleavages": 1,
            "min_len": 7,
            "max_len": 30,
            "cleave_at": "KR",
            "restrict": "P",
        },
        "peptide_min_mass": 500.0,
        "peptide_max_mass": 5000.0,
        "min_ion_index": 2,
        "static_mods": {"C": 57.0215},
        "max_variable_mods": 2,
        "decoy_tag": "rev_",
        "fasta": "/root/reference/tests/Q99536.fasta",
    },
    "precursor_tol": {"ppm": [-50, 50]},
    "fragment_tol": {"ppm": [-10, 10]},
    "isotope_errors": [-1, 3],
    "deisotope": True,
    "mzml_paths": ["/root/reference/tests/LQSRPAAPPAPGPGQLTLR.mzML"],
}


@pytest.fixture(scope="module")
def run_result(tmp_path_factory):
    from sage_tpu.pipeline.input import build_search
    from sage_tpu.pipeline.runner import Runner

    outdir = str(tmp_path_factory.mktemp("sage_out"))
    cfg = dict(CONFIG)
    search = build_search(
        cfg, output_directory=outdir, write_pin=True, annotate_matches=True
    )
    runner = Runner(search)
    result = runner.run()
    return search, runner, result, outdir


def test_tsv_contract(run_result):
    search, runner, result, outdir = run_result
    tsv = os.path.join(outdir, "results.sage.tsv")
    lines = open(tsv).read().splitlines()
    header = lines[0].split("\t")
    assert len(header) == 43
    assert header[0] == "psm_id" and header[-1] == "ms2_intensity"
    assert len(lines) == 2  # 1 PSM
    row = dict(zip(header, lines[1].split("\t")))
    assert row["peptide"] == "LQSRPAAPPAPGPGQLTLR"
    assert row["proteins"] == "sp|Q99536|VAT1_HUMAN"
    assert row["charge"] == "3"
    assert row["label"] == "1"
    assert row["rank"] == "1"
    assert row["scannr"] == "controllerType=0 controllerNumber=1 scan=30069"
    assert int(row["matched_peaks"]) == 22  # top-150 peak selection
    assert float(row["hyperscore"]) > 0
    # q-values saturate at 1.0 with a single PSM and no decoys
    assert row["spectrum_q"] == "1.0"
    assert row["peptide_q"] == "1.0"


def test_pin_output(run_result):
    search, runner, result, outdir = run_result
    pin = os.path.join(outdir, "results.sage.pin")
    lines = open(pin).read().splitlines()
    header = lines[0].split("\t")
    assert len(header) == 39
    assert header[0] == "SpecId" and header[-1] == "Proteins"
    row = dict(zip(header, lines[1].split("\t")))
    assert row["ScanNr"] == "30069"  # extracted via scan=(\d+) regex
    assert row["z=3"] == "1" and row["z=2"] == "0"
    assert row["Peptide"] == "LQSRPAAPPAPGPGQLTLR"


def test_fragment_annotations(run_result):
    search, runner, result, outdir = run_result
    frags = os.path.join(outdir, "matched_fragments.sage.tsv")
    lines = open(frags).read().splitlines()
    assert lines[0].startswith("psm_id\tfragment_type")
    assert len(lines) == 23  # header + 22 matched fragments
    kinds = {ln.split("\t")[1] for ln in lines[1:]}
    assert kinds <= {"b", "y"}


def test_results_json(run_result):
    search, runner, result, outdir = run_result
    params = json.load(open(os.path.join(outdir, "results.json")))
    assert params["precursor_tol"] == {"ppm": [-50.0, 50.0]}
    assert params["isotope_errors"] == [-1, 3]
    assert params["database"]["fasta"].endswith("Q99536.fasta")
    assert any(p.endswith("results.sage.tsv") for p in params["output_paths"])


@pytest.mark.parametrize("low_memory", [True, False])
def test_prefilter_mode(tmp_path, low_memory):
    """Prefilter mode (runner.rs:143-240) must find the same golden PSM:
    the chunked quick-score retains the matching peptide, and the final
    index built from the union reproduces the standard search."""
    from sage_tpu.pipeline.input import build_search
    from sage_tpu.pipeline.runner import Runner

    cfg = json.loads(json.dumps(CONFIG))
    cfg["database"]["prefilter"] = True
    cfg["database"]["prefilter_low_memory"] = low_memory
    cfg["database"]["prefilter_chunk_size"] = 1
    search = build_search(cfg, output_directory=str(tmp_path))
    runner = Runner(search)
    result = runner.run()
    feats = result["features"]
    assert len(feats) == 1
    pep = runner.database.peptides[int(feats.columns["peptide_idx"][0])]
    assert pep.sequence == b"LQSRPAAPPAPGPGQLTLR"
    assert int(feats.columns["matched_peaks"][0]) == 22


def test_parquet_output(tmp_path):
    """--parquet replaces the TSV outputs with the reference's parquet
    schemas (parquet.rs:28-83, 255-412): 44/45-column results (the
    reporter-ion list column appears only with TMT) + matched fragments."""
    pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    from sage_tpu.pipeline.input import build_search
    from sage_tpu.pipeline.runner import Runner

    cfg = json.loads(json.dumps(CONFIG))
    search = build_search(
        cfg, output_directory=str(tmp_path), parquet=True, annotate_matches=True
    )
    runner = Runner(search)
    runner.run()
    res = pq.read_table(str(tmp_path / "results.sage.parquet"))
    assert res.num_rows == 1
    names = res.schema.names
    assert names[0] == "psm_id"
    assert "sage_discriminant_score" in names and "protein_group_q" in names
    assert len(names) == 44  # no TMT -> no reporter_ion_intensity column
    d = res.to_pydict()
    assert d["peptide"][0] == "LQSRPAAPPAPGPGQLTLR"
    assert d["stripped_peptide"][0] == "LQSRPAAPPAPGPGQLTLR"
    assert d["charge"][0] == 3
    assert d["matched_peaks"][0] == 22
    assert d["is_decoy"][0] is False

    frag = pq.read_table(str(tmp_path / "matched_fragments.sage.parquet"))
    assert frag.num_rows == 22
    assert frag.schema.names[1] == "fragment_type"
    assert set(frag.to_pydict()["fragment_type"]) <= {"b", "y"}


def test_html_report(tmp_path):
    """--write-report emits the 4-section QC HTML (runner.rs:1242-1802)."""
    from sage_tpu.pipeline.input import build_search
    from sage_tpu.pipeline.runner import Runner

    cfg = json.loads(json.dumps(CONFIG))
    search = build_search(cfg, output_directory=str(tmp_path), write_report=True)
    Runner(search).run()
    htm = (tmp_path / "sage.report.html").read_text()
    for needle in (
        "Results overview", "Scoring quality control",
        "Predicted properties", "Configuration", "<svg", "LQSRPAAPPAPGPGQLTLR",
    ):
        assert needle in htm, needle
    assert htm.count("<svg") >= 4


def test_multi_file_run(tmp_path):
    """Two input files: per-file file_id/filename columns, global RT
    alignment across runs (retention_alignment.rs:95-173), and one merged
    FDR pass."""
    import shutil

    src = "/root/reference/tests/LQSRPAAPPAPGPGQLTLR.mzML"
    a = tmp_path / "run_a.mzML"
    b = tmp_path / "run_b.mzML"
    shutil.copy(src, a)
    shutil.copy(src, b)
    from sage_tpu.pipeline.input import build_search
    from sage_tpu.pipeline.runner import Runner

    cfg = json.loads(json.dumps(CONFIG))
    cfg["mzml_paths"] = [str(a), str(b)]
    search = build_search(cfg, output_directory=str(tmp_path))
    result = Runner(search).run()
    feats = result["features"]
    assert len(feats) == 2
    assert sorted(feats.columns["file_id"].tolist()) == [0, 1]
    tsv = (tmp_path / "results.sage.tsv").read_text().splitlines()
    assert len(tsv) == 3
    names = {ln.split("\t")[6] for ln in tsv[1:]}
    assert names == {"run_a.mzML", "run_b.mzML"}
    # both files found the same golden peptide
    peptides = {ln.split("\t")[1] for ln in tsv[1:]}
    assert peptides == {"LQSRPAAPPAPGPGQLTLR"}



def _write_tmt_mzml(path):
    """One-scan mzML with TMT6 reporter peaks spliced into the golden
    spectrum; returns the reporter intensities."""
    import base64
    import zlib as _zlib

    import numpy as np

    from sage_tpu.chem.mass import PROTON  # noqa: F401 (parity import)
    from sage_tpu.io.mzml import read_mzml
    from sage_tpu.quant.tmt import TMT6PLEX

    raw = read_mzml("/root/reference/tests/LQSRPAAPPAPGPGQLTLR.mzML")[0]
    rep_mz = TMT6PLEX.astype(np.float64)
    rep_int = np.linspace(1e7, 6e7, 6)
    mz = np.concatenate([rep_mz, raw.mz.astype(np.float64)])
    inten = np.concatenate([rep_int.astype(np.float32), raw.intensity])
    order = np.argsort(mz)
    mz, inten = mz[order], inten[order]

    def enc(arr, dtype):
        return base64.b64encode(
            _zlib.compress(np.asarray(arr, dtype).tobytes())
        ).decode()

    prec = raw.precursors[0]
    doc = f'''<?xml version="1.0"?><mzML><run><spectrumList>
<spectrum id="{raw.id}"><cvParam accession="MS:1000511" value="2"/>
<cvParam accession="MS:1000127" value=""/>
<cvParam accession="MS:1000285" value="{float(inten.sum())}"/>
<scanList><scan><cvParam accession="MS:1000016" value="10.0" unitAccession="UO:0000031"/>
<cvParam accession="MS:1000927" value="55.0"/></scan></scanList>
<precursorList><precursor><selectedIonList><selectedIon>
<cvParam accession="MS:1000744" value="{prec.mz}"/>
<cvParam accession="MS:1000041" value="{prec.charge}"/>
</selectedIon></selectedIonList></precursor></precursorList>
<binaryDataArrayList>
<binaryDataArray><cvParam accession="MS:1000523" value=""/><cvParam accession="MS:1000574" value=""/><cvParam accession="MS:1000514" value=""/><binary>{enc(mz, np.float64)}</binary></binaryDataArray>
<binaryDataArray><cvParam accession="MS:1000521" value=""/><cvParam accession="MS:1000574" value=""/><cvParam accession="MS:1000515" value=""/><binary>{enc(inten, np.float32)}</binary></binaryDataArray>
</binaryDataArrayList></spectrum></spectrumList></run></mzML>'''
    path.write_text(doc)
    return rep_int


def test_tmt_quant_e2e(tmp_path):
    """MS2-level TMT: reporter ions extracted per spectrum into tmt.tsv
    and the nested parquet reporter_ion_intensity column (tmt.rs:314-352,
    parquet.rs:75-83)."""
    pytest.importorskip("pyarrow")
    import numpy as np
    import pyarrow.parquet as pq

    path = tmp_path / "tmt.mzML"
    rep_int = _write_tmt_mzml(path)

    from sage_tpu.pipeline.input import build_search
    from sage_tpu.pipeline.runner import Runner

    cfg = json.loads(json.dumps(CONFIG))
    cfg["mzml_paths"] = [str(path)]
    cfg["deisotope"] = False
    cfg["quant"] = {"tmt": "Tmt6", "tmt_settings": {"level": 2}}
    search = build_search(cfg, output_directory=str(tmp_path), parquet=True)
    Runner(search).run()

    res = pq.read_table(str(tmp_path / "results.sage.parquet"))
    assert "reporter_ion_intensity" in res.schema.names
    reps = res.to_pydict()["reporter_ion_intensity"][0]
    assert len(reps) == 6
    np.testing.assert_allclose(reps, rep_int, rtol=1e-5)


def _write_lc_run(path, db, targets, elute_rt, rng, rt_shift=0.0,
                  scale=1.0):
    """Synthetic LC-MS run: MS1 frames carrying 3-peak isotope envelopes
    of eluting peptides (gaussian elution profiles) plus one MS2 per
    target near its apex — enough structure for the full FlashLFQ-style
    pipeline (lfq.rs feature map + warp + spectral angle)."""
    import base64
    import zlib as _zlib

    from sage_tpu.chem.mass import PROTON

    NEUTRON = 1.00335
    b, y = db.table.ladders()
    mono, lens = db.table.mono, db.table.lens

    def enc(arr, dtype):
        return base64.b64encode(
            _zlib.compress(np.asarray(arr, dtype).tobytes())
        ).decode()

    parts = ['<?xml version="1.0"?><mzML><run><spectrumList>']
    scan = 0
    ms2_emitted = set()
    for rt in np.arange(0.0, 24.0, 0.05):
        mzs, ints = [], []
        for ti, p in enumerate(targets):
            w = np.exp(-0.5 * ((rt - (elute_rt[ti] + rt_shift)) / 0.5) ** 2)
            if w < 0.02:
                continue
            for iso in range(3):
                mzs.append((float(mono[p]) + iso * NEUTRON) / 2 + PROTON)
                ints.append(scale * 1e6 * w * (0.6 ** iso))
        if not mzs:
            mzs, ints = [500.0], [1.0]
        order = np.argsort(mzs)
        mzs = np.asarray(mzs)[order]
        ints = np.asarray(ints)[order]
        scan += 1
        parts.append(
            f'<spectrum id="scan={scan}">'
            '<cvParam accession="MS:1000511" value="1"/>'
            '<cvParam accession="MS:1000127" value=""/>'
            f'<cvParam accession="MS:1000285" value="{float(np.sum(ints))}"/>'
            '<scanList><scan>'
            f'<cvParam accession="MS:1000016" value="{rt}" unitAccession="UO:0000031"/>'
            "</scan></scanList><binaryDataArrayList>"
            '<binaryDataArray><cvParam accession="MS:1000523" value=""/>'
            '<cvParam accession="MS:1000574" value=""/>'
            '<cvParam accession="MS:1000514" value=""/>'
            f"<binary>{enc(mzs, np.float64)}</binary></binaryDataArray>"
            '<binaryDataArray><cvParam accession="MS:1000521" value=""/>'
            '<cvParam accession="MS:1000574" value=""/>'
            '<cvParam accession="MS:1000515" value=""/>'
            f"<binary>{enc(ints, np.float32)}</binary></binaryDataArray>"
            "</binaryDataArrayList></spectrum>"
        )
        for ti, p in enumerate(targets):
            if ti in ms2_emitted or abs(rt - (elute_rt[ti] + rt_shift)) > 0.03:
                continue
            ms2_emitted.add(ti)
            ni = int(lens[p]) - 1
            frags = np.concatenate([b[p, :ni], y[p, :ni]]) + PROTON
            keep = frags[rng.random(frags.shape[0]) < 0.9]
            # noise floor keeps every spectrum above the min_peaks filter
            keep = np.concatenate(
                [keep, rng.uniform(200.0, 1500.0, 12)]
            )
            fi = rng.uniform(1e4, 1e6, keep.shape[0])
            order = np.argsort(keep)
            keep, fi = keep[order], fi[order]
            prec = float(mono[p]) / 2 + PROTON
            scan += 1
            parts.append(
                f'<spectrum id="scan={scan}">'
                '<cvParam accession="MS:1000511" value="2"/>'
                '<cvParam accession="MS:1000127" value=""/>'
                f'<cvParam accession="MS:1000285" value="{float(np.sum(fi))}"/>'
                '<scanList><scan>'
                f'<cvParam accession="MS:1000016" value="{rt}" unitAccession="UO:0000031"/>'
                "</scan></scanList><precursorList><precursor>"
                "<selectedIonList><selectedIon>"
                f'<cvParam accession="MS:1000744" value="{prec}"/>'
                '<cvParam accession="MS:1000041" value="2"/>'
                "</selectedIon></selectedIonList></precursor></precursorList>"
                "<binaryDataArrayList>"
                '<binaryDataArray><cvParam accession="MS:1000523" value=""/>'
                '<cvParam accession="MS:1000574" value=""/>'
                '<cvParam accession="MS:1000514" value=""/>'
                f"<binary>{enc(keep, np.float64)}</binary></binaryDataArray>"
                '<binaryDataArray><cvParam accession="MS:1000521" value=""/>'
                '<cvParam accession="MS:1000574" value=""/>'
                '<cvParam accession="MS:1000515" value=""/>'
                f"<binary>{enc(fi, np.float32)}</binary></binaryDataArray>"
                "</binaryDataArrayList></spectrum>"
            )
    parts.append("</spectrumList></run></mzML>")
    path.write_text("".join(parts))
    return len(ms2_emitted)


def test_lfq_e2e_multifile(tmp_path):
    """Full label-free quant across two LC runs with a retention-time
    shift: confident precursors must be quantified in BOTH files (time
    warping lfq.rs:347-420 bridges the shift) with the ~2x abundance
    ratio of the second run recovered, lfq.tsv + long-format rows
    written, and 5% picked-precursor FDR applied (fdr.rs:228-287)."""
    from sage_tpu.chem.fasta import Fasta
    from sage_tpu.index.builder import DatabaseParams

    AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    rng = np.random.default_rng(17)
    lines = []
    for i in range(80):
        seq = AA[rng.integers(0, len(AA), size=240)].tobytes().decode()
        lines.append(f">sp|LFQ{i:03d}|LFQ{i}_SYN synthetic\n{seq}")
    fasta_path = tmp_path / "lfq.fasta"
    fasta_path.write_text("\n".join(lines))
    params = DatabaseParams()
    db = params.build(
        Fasta.parse("\n".join(lines), params.decoy_tag, True)
    )
    targets = np.flatnonzero(~db.table.decoy & (db.table.lens >= 10))[:150]
    elute_rt = rng.uniform(3.0, 21.0, len(targets))
    n_a = _write_lc_run(tmp_path / "a.mzML", db, targets, elute_rt, rng)
    n_b = _write_lc_run(
        tmp_path / "b.mzML", db, targets, elute_rt, rng,
        rt_shift=0.9, scale=2.0,
    )
    assert min(n_a, n_b) >= 20

    from sage_tpu.pipeline.input import build_search
    from sage_tpu.pipeline.runner import Runner

    cfg = {
        "database": {"fasta": str(fasta_path)},
        "precursor_tol": {"ppm": [-20, 20]},
        "fragment_tol": {"ppm": [-10, 10]},
        "deisotope": False,
        "quant": {"lfq": True},
        "mzml_paths": [str(tmp_path / "a.mzML"), str(tmp_path / "b.mzML")],
    }
    search = build_search(cfg, output_directory=str(tmp_path))
    result = Runner(search).run()
    areas = result["lfq"]
    assert areas, "no LFQ areas produced"
    tsv = (tmp_path / "lfq.tsv").read_text().splitlines()
    assert len(tsv) >= 10
    header = tsv[0].split("\t")
    ia = header.index("a.mzML")
    ib = header.index("b.mzML")
    ratios = []
    for ln in tsv[1:]:
        c = ln.split("\t")
        va, vb = float(c[ia] or 0), float(c[ib] or 0)
        if va > 0 and vb > 0:
            ratios.append(vb / va)
    # warping must quantify most precursors in both runs despite the
    # 0.9 min shift, and recover the 2x spike-in ratio
    assert len(ratios) >= (len(tsv) - 1) * 0.6, (len(ratios), len(tsv))
    med = float(np.median(ratios))
    assert 1.4 <= med <= 2.8, med


def test_prefilter_low_memory_read_pattern(tmp_path, monkeypatch):
    """When the spectra RAM estimate exceeds the budget, prefilter must
    re-read the input files per FASTA chunk (reference runner.rs:144-151)
    instead of holding every file in RAM — and still find the golden PSM."""
    from sage_tpu.pipeline.input import build_search
    from sage_tpu.pipeline.runner import Runner

    cfg = json.loads(json.dumps(CONFIG))
    cfg["database"]["prefilter"] = True
    cfg["database"]["prefilter_chunk_size"] = 1
    search = build_search(cfg, output_directory=str(tmp_path))

    reads = []
    orig = Runner.read_file

    def counting_read(self, path, file_id):
        reads.append(path)
        return orig(self, path, file_id)

    monkeypatch.setattr(Runner, "read_file", counting_read)
    # 0 MiB budget: every file is over budget -> chunk-major re-reads
    monkeypatch.setenv("SAGE_TPU_PREFILTER_RAM_MB", "0")
    runner = Runner(search)
    result = runner.run()
    # reads: 1 initial (budget probe) + one per (chunk, file) + 1 final
    # search pass; with the in-RAM path it would be exactly 2 total
    assert len(reads) > 2, f"expected per-chunk re-reads, saw {len(reads)}"
    assert len(result["features"]) >= 1

    # default budget: spectra stay in RAM -> exactly 2 reads
    # (1 prefilter + 1 final search)
    reads.clear()
    monkeypatch.delenv("SAGE_TPU_PREFILTER_RAM_MB")
    search2 = build_search(
        json.loads(json.dumps(cfg)), output_directory=str(tmp_path / "b")
    )
    result2 = Runner(search2).run()
    assert len(reads) == 2, f"expected 2 reads in RAM mode, saw {len(reads)}"
    assert len(result2["features"]) == len(result["features"])
