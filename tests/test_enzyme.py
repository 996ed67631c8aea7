"""Digestion golden tests, mirrored from the reference's inline tests
(/root/reference/crates/sage/src/enzyme.rs:345-811)."""

import random

from sage_tpu.chem.enzyme import Enzyme, EnzymeParameters, Position
from sage_tpu.chem.mass import VALID_AA


def _digest(params, sequence):
    return [d.sequence for d in params.digest(sequence, "")]


def test_trypsin():
    seq = "MADEEKLPPGWEKRMSRSSGRVYYFNHITNASQWERPSGN"
    tryp = EnzymeParameters(0, 2, 50, Enzyme.new("KR", "P", True, False))
    out = [(d.sequence, d.position) for d in tryp.digest(seq, "")]
    assert out == [
        ("MADEEK", Position.NTERM),
        ("LPPGWEK", Position.INTERNAL),
        ("MSR", Position.INTERNAL),
        ("SSGR", Position.INTERNAL),
        ("VYYFNHITNASQWERPSGN", Position.CTERM),
    ]


def test_trypsin_missed_cleavage():
    seq = "MADEEKLPPGWEKRMSRSSGRVYYFNHITNASQWERPSGN"
    tryp = EnzymeParameters(1, 0, 50, Enzyme.new("KR", "P", True, False))
    assert _digest(tryp, seq) == [
        "MADEEK", "LPPGWEK", "R", "MSR", "SSGR", "VYYFNHITNASQWERPSGN",
        "MADEEKLPPGWEK", "LPPGWEKR", "RMSR", "MSRSSGR", "SSGRVYYFNHITNASQWERPSGN",
    ]


def test_trypsin_missed_cleavage_2():
    seq = "MADEEKLPPGWEKRMSRSSGRVYYFNHITNASQWERPSGN"
    tryp = EnzymeParameters(2, 0, 50, Enzyme.new("KR", "P", True, False))
    assert _digest(tryp, seq) == [
        "MADEEK", "LPPGWEK", "R", "MSR", "SSGR", "VYYFNHITNASQWERPSGN",
        "MADEEKLPPGWEK", "LPPGWEKR", "RMSR", "MSRSSGR", "SSGRVYYFNHITNASQWERPSGN",
        "MADEEKLPPGWEKR", "LPPGWEKRMSR", "RMSRSSGR", "MSRSSGRVYYFNHITNASQWERPSGN",
    ]


def test_trypsin_no_proline_restriction():
    seq = "MADEEKLPPGWEKRMSRSSGRVYYFNHITNASQWERPSGN"
    tryp = EnzymeParameters(0, 2, 50, Enzyme.new("KR", "", True, False))
    assert _digest(tryp, seq) == [
        "MADEEK", "LPPGWEK", "MSR", "SSGR", "VYYFNHITNASQWER", "PSGN",
    ]


def test_asp_n():
    seq = "MADEEKLPPGWEKRMSRSSGRVYYFNHITNASQWERPSGNW"
    aspn = EnzymeParameters(0, 1, 50, Enzyme.new("D", "", False, False))
    assert _digest(aspn, seq) == ["MA", "DEEKLPPGWEKRMSRSSGRVYYFNHITNASQWERPSGNW"]


def test_chymotrypsin():
    seq = "MADEEKLPPGWEKRMSRSSGRVYYFNHITNASQWERPSGNW"
    chymo = EnzymeParameters(0, 1, 50, Enzyme.new("FYWL", "", True, False))
    assert _digest(chymo, seq) == [
        "MADEEKL", "PPGW", "EKRMSRSSGRVY", "Y", "F", "NHITNASQW", "ERPSGNW",
    ]


def test_nonspecific_digest_5():
    seq = "MADEEKLPPGWEKRMSRSSGRVYYFNHITNASQWERPSGNW"
    params = EnzymeParameters(0, 5, 5, None)
    expected = [seq[i : i + 5] for i in range(len(seq) - 4)]
    assert _digest(params, seq) == expected


def test_nonspecific_digest_5_7():
    seq = "MADEEKLPPGWEKRMSRSSGRVYYFNHITNASQWERPSGNW"
    params = EnzymeParameters(0, 5, 7, Enzyme.new("", "", True, False))
    expected = [
        seq[i : i + w] for w in range(5, 8) for i in range(len(seq) - w + 1)
    ]
    assert _digest(params, seq) == expected


def test_no_digest():
    seq = "MADEEKLPPGWEKRMSRSSGRVYYFNHITNASQWERPSGNW"
    params = EnzymeParameters(0, 0, 10**9, Enzyme.new("$", "", True, False))
    assert _digest(params, seq) == [seq]


def test_ensure_unique():
    seq = "KVEGAQNQGKKVEGAQNQGK"
    params = EnzymeParameters(0, 2, 10**9, Enzyme.new("KR", "", True, False))
    assert _digest(params, seq) == ["VEGAQNQGK"]


def test_mini_semi_trypsin():
    seq = "MADEEK"
    params = EnzymeParameters(0, 2, 50, Enzyme.new("KR", "P", True, True))
    assert _digest(params, seq) == [
        "MADEEK", "ADEEK", "MA", "DEEK", "MAD", "EEK", "MADE", "EK", "MADEE",
    ]


def test_semi_trypsin_missed_cleavage():
    seq = "MADEEKLPPGWEK"
    params = EnzymeParameters(1, 3, 50, Enzyme.new("KR", "P", True, True))
    expected = [
        "MADEEK", "LPPGWEK", "MADEEKLPPGWEK",
        "ADEEK", "DEEK", "MAD", "EEK", "MADE", "MADEE",
        "PPGWEK", "PGWEK", "LPP", "GWEK", "LPPG", "WEK", "LPPGW", "LPPGWE",
        "ADEEKLPPGWEK", "DEEKLPPGWEK", "EEKLPPGWEK", "EKLPPGWEK", "KLPPGWEK",
        "MADEEKL", "MADEEKLP", "MADEEKLPP", "MADEEKLPPG", "MADEEKLPPGW",
        "MADEEKLPPGWE",
    ]
    digests = params.digest(seq, "")
    assert [d.sequence for d in digests] == expected
    for d in digests:
        # Interior missed-cleavage invariant (enzyme.rs:737-756)
        mc = sum(1 for c in d.sequence[:-1] if c in "KR")
        assert mc == d.missed_cleavages, d.sequence
        if d.sequence.startswith("MAD") and d.sequence != seq:
            assert d.position == Position.NTERM


def test_quickcheck_semi_missed_cleavages():
    # Property test (enzyme.rs:782-811): missed-cleavage count equals the
    # number of interior K/R residues, for random sequences.
    rng = random.Random(42)
    alphabet = [chr(a) for a in VALID_AA]
    params = EnzymeParameters(2, 3, 50, Enzyme.new("KR", "", True, True))
    for _ in range(25):
        seq = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 60)))
        for d in params.digest(seq, ""):
            mc = sum(1 for c in d.sequence[:-1] if c in "KR")
            assert mc == d.missed_cleavages, (seq, d.sequence)
            assert d.missed_cleavages <= 2


def test_digest_reverse_keeps_termini():
    from sage_tpu.chem.enzyme import Digest

    d = Digest(False, "ABCDE", "p", 0, Position.INTERNAL)
    r = d.reverse()
    assert r.sequence == "ADCBE"
    assert r.decoy
    # Reversing a decoy is a no-op clone
    assert r.reverse().sequence == "ADCBE"


def test_group_digests_merges_proteins():
    from sage_tpu.chem.enzyme import Digest, group_digests

    ds = [
        Digest(False, "PEPTIDEK", "B", 0, Position.INTERNAL),
        Digest(False, "PEPTIDEK", "A", 0, Position.INTERNAL),
        Digest(False, "OTHERK", "A", 0, Position.INTERNAL),
    ]
    groups = group_digests(ds)
    by_seq = {g.reference.sequence: g.proteins for g in groups}
    assert by_seq["PEPTIDEK"] == ["A", "B"]
    assert by_seq["OTHERK"] == ["A"]
