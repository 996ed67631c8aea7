"""Fragment index + ion series tests, mirrored from the reference's
ion_series.rs and database.rs inline tests plus the quickcheck index
invariant (sage/tests/integration.rs:30-70)."""

import random

import numpy as np

from sage_tpu.chem.enzyme import Digest, Position
from sage_tpu.chem.fasta import Fasta
from sage_tpu.chem.mass import PROTON
from sage_tpu.chem.modification import ModificationSpecificity as Spec
from sage_tpu.chem.peptide import Peptide
from sage_tpu.index.builder import (
    DatabaseParams,
    PeptideTable,
    _ion_ladder,
    binary_search_slice,
    generate_index_fragments,
)

F32 = np.float32


def peptide(seq: str, static=None, position=Position.INTERNAL) -> Peptide:
    p = Peptide.from_digest(Digest(False, seq, "", 0, position, False))
    if static:
        p = p.apply([], static, 1)[0]
    return p


def ion_mz(table, kind, charge=1.0):
    """(ladder + z*PROTON)/z for the valid ions of row 0."""
    lad = _ion_ladder(table, kind)[0]
    n = int(table.lens[0]) - 1
    z = F32(charge)
    return [(lad[i] + z * PROTON) / z for i in range(n)]


def check_within(observed, expected, tol=0.005):
    assert len(observed) == len(expected)
    for a, b in zip(observed, expected):
        assert abs(float(a) - float(b)) < tol, (observed, expected)


def test_abc_xyz_series():
    # ion_series.rs:129-145
    t = PeptideTable.from_peptides([peptide("PEPTIDE")])
    check_within(ion_mz(t, "a"), [70.065, 199.108, 296.160, 397.208, 510.292, 625.32])
    check_within(ion_mz(t, "b"), [98.0600, 227.1026, 324.155, 425.2030, 538.287, 653.314])
    check_within(ion_mz(t, "c"), [115.086, 244.129, 341.182, 442.229, 555.314, 670.341])
    check_within(ion_mz(t, "x"), [729.294, 600.251, 503.198, 402.151, 289.066, 174.039])
    check_within(ion_mz(t, "y"), [703.314, 574.2719, 477.219, 376.171, 263.0874, 148.0604])
    check_within(ion_mz(t, "z"), [686.288, 557.245, 460.193, 359.145, 246.061, 131.034])


def test_decoy_y_ions_z2():
    # ion_series.rs:237-255
    t = PeptideTable.from_peptides([peptide("PEPTIDE")])
    check_within(
        ion_mz(t, "y", 2.0),
        [352.16087, 287.6396, 239.11319, 188.58935, 132.04732, 74.53385],
    )
    t = PeptideTable.from_peptides([peptide("EDITPEP")])
    check_within(
        ion_mz(t, "y", 2.0),
        [336.16596, 278.6525, 222.11046, 171.58662, 123.060237, 58.53894],
    )


def test_nterm_mod_shifts_b_only():
    # ion_series.rs:257-277
    t = PeptideTable.from_peptides([peptide("PEPTIDE", {Spec.parse("^"): 229.01})])
    base_b = [98.06004, 227.10263, 324.1554, 425.20306, 538.2872, 653.3141]
    check_within(ion_mz(t, "b"), [x + 229.01 for x in base_b], tol=0.01)
    check_within(
        ion_mz(t, "y"),
        [703.31447, 574.27188, 477.21912, 376.17144, 263.08737, 148.06043],
        tol=0.01,
    )


def test_cterm_mod_shifts_y_only():
    # ion_series.rs:279-300
    t = PeptideTable.from_peptides([peptide("PEPTIDE", {Spec.parse("$"): 229.01})])
    base_y = [703.31447, 574.27188, 477.21912, 376.17144, 263.08737, 148.06043]
    check_within(ion_mz(t, "y"), [x + 229.01 for x in base_y], tol=0.01)
    check_within(
        ion_mz(t, "b"),
        [98.06004, 227.10263, 324.1554, 425.20306, 538.2872, 653.3141],
        tol=0.01,
    )


def test_internal_mod():
    # ion_series.rs:302-328
    t = PeptideTable.from_peptides([peptide("PEPTIDE", {Spec.parse("I"): 29.0})])
    check_within(
        ion_mz(t, "b"),
        [98.06004, 227.10263, 324.1554, 425.20306, 538.2872 + 29.0, 653.3141 + 29.0],
        tol=0.01,
    )
    check_within(
        ion_mz(t, "y"),
        [703.31447 + 29.0, 574.27188 + 29.0, 477.21912 + 29.0, 376.17144 + 29.0,
         263.08737, 148.06043],
        tol=0.01,
    )


def test_min_ion_index_filter():
    # ion_series.rs:193-234: min_ion_index 2 drops b1/b2/y1/y2
    t = PeptideTable.from_peptides([peptide("PEPTIDE")])
    mz, pep = generate_index_fragments(t, ("b", "y"), 2)
    expected = [
        324.155397, 425.203076, 538.287140, 653.314083,  # b3..b6
        703.314477 - PROTON + PROTON, 574.271884, 477.219120, 376.171441,  # y6..y3
    ]
    got = sorted(float(x + PROTON) for x in mz)
    assert len(got) == 8
    for g, e in zip(got, sorted(expected)):
        assert abs(g - e) < 0.1


def test_database_digestion_with_protein_nterm_mod():
    # database.rs:595-671
    fasta_text = """
    >sp|AAAAA
    MEWKLEQSMREQALLKAQLTQLK
    >sp|BBBBB
    RMEWKLEQSMREQALLKAQLTQLK
    """
    fasta = Fasta.parse(fasta_text, "rev_", False)
    assert fasta.targets == [
        ("sp|AAAAA", "MEWKLEQSMREQALLKAQLTQLK"),
        ("sp|BBBBB", "RMEWKLEQSMREQALLKAQLTQLK"),
    ]

    params = DatabaseParams(
        bucket_size=128,
        enzyme={"missed_cleavages": 1, "min_len": 6, "max_len": 10},
        peptide_min_mass=150.0,
        peptide_max_mass=5000.0,
        ion_kinds=("b", "y"),
        min_ion_index=2,
        static_mods={},
        variable_mods={Spec.parse("["): [42.0]},
        max_variable_mods=2,
        decoy_tag="rev_",
        generate_decoys=False,
        fasta="none",
    )
    peptides = params.digest(fasta)
    assert [str(p) for p in peptides] == [
        "EQALLK",
        "LEQSMR",
        "AQLTQLK",
        "MEWKLEQSMR",
        "[+42]-MEWKLEQSMR",
    ]
    for p in peptides[:4]:
        assert len(p.proteins) == 2, str(p)
    assert peptides[-1].proteins == ["sp|AAAAA"]


def test_binary_search_slice_invariants():
    # database.rs:569-593
    data = np.array([1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0])
    lo, hi = binary_search_slice(data, 1.75, 3.5)
    assert (lo, hi) == (1, 6)
    assert data[lo] <= 1.75
    assert list(data[lo:hi]) == [1.5, 2.0, 2.5, 3.0, 3.5]
    assert binary_search_slice(data, 0.0, 5.0) == (0, len(data))

    data = np.array([1.0, 1.5, 1.5, 1.5, 1.5, 2.0, 2.5, 3.0, 3.0, 3.5, 4.0])
    left, right = binary_search_slice(data, 1.5, 3.25)
    assert data[left] <= 1.5
    assert data[right] > 3.25
    assert list(data[left:right]) == [1.0, 1.5, 1.5, 1.5, 1.5, 2.0, 2.5, 3.0, 3.0]


def test_index_query_property():
    """The key index invariant (sage/tests/integration.rs:30-70): for random
    fragment windows and random bucket sizes, the bucketed query returns
    exactly the set of in-tolerance fragments, and each bucket is internally
    ordered by peptide index with correct minima."""
    fasta_text = ">sp|TEST\nMEWKLEQSMREQALLKAQLTQLKPEPTIDESAMPLEKRANDOMSEQK"
    fasta = Fasta.parse(fasta_text, "rev_", True)
    rng = random.Random(7)
    for bucket_size in (2, 8, 64, 1024):
        params = DatabaseParams(
            bucket_size=bucket_size,
            enzyme={"missed_cleavages": 1, "min_len": 4, "max_len": 30},
            peptide_min_mass=200.0,
            peptide_max_mass=5000.0,
            generate_decoys=True,
            fasta="none",
        )
        db = params.build(fasta)
        assert db.num_fragments > 0

        # Bucket structure invariants
        n = db.num_fragments
        for b, mn in enumerate(db.bucket_min):
            s, e = b * db.bucket_size, min((b + 1) * db.bucket_size, n)
            assert np.all(np.diff(db.fragment_pep[s:e].astype(np.int64)) >= 0)
            assert mn == db.fragment_mz[s:e].min()

        # Random window queries vs brute force
        for _ in range(50):
            f_center = rng.uniform(150, 1500)
            f_half = rng.uniform(0.001, 5.0)
            p_center = rng.uniform(300, 3000)
            p_half = rng.uniform(0.01, 500.0)
            flo, fhi = F32(f_center - f_half), F32(f_center + f_half)
            plo, phi = F32(p_center - p_half), F32(p_center + p_half)

            got = db.query_fragments(plo, phi, flo, fhi)
            got_set = sorted(
                (float(db.fragment_mz[i]), int(db.fragment_pep[i])) for i in got
            )
            mono = db.table.mono
            brute = sorted(
                (float(mz), int(pi))
                for mz, pi in zip(db.fragment_mz, db.fragment_pep)
                if flo <= mz <= fhi and plo <= mono[pi] <= phi
            )
            assert got_set == brute
