"""Peptide modification golden tests, mirrored from
/root/reference/crates/sage/src/peptide.rs:409-721."""

import numpy as np

from sage_tpu.chem.enzyme import Digest, Enzyme, EnzymeParameters, Position
from sage_tpu.chem.modification import ModificationSpecificity as Spec
from sage_tpu.chem.peptide import Peptide


def peptide(seq: str, position=Position.INTERNAL) -> Peptide:
    return Peptide.from_digest(
        Digest(False, seq, "", 0, position, False)
    )


def var_mod_sequences(p, mods, combo):
    return [str(x) for x in p.clone().apply(list(mods), {}, combo)]


def test_full_terminal_grammar():
    seq = "MPEPTIDEKMSAGEKEND"
    tryp = EnzymeParameters(0, 0, 50, Enzyme.new("KR", "P", True, False))
    peps = [Peptide.from_digest(d) for d in tryp.digest(seq, "")]
    assert len(peps) == 3
    assert str(peps[0]) == "MPEPTIDEK" and peps[0].position == Position.NTERM
    assert str(peps[1]) == "MSAGEK" and peps[1].position == Position.INTERNAL
    assert str(peps[2]) == "END" and peps[2].position == Position.CTERM

    mods = [
        (Spec.parse("["), 42.0),
        (Spec.parse("]"), 11.0),
        (Spec.parse("^"), 12.0),
        (Spec.parse("$"), 19.0),
    ]
    assert var_mod_sequences(peps[0], mods, 2) == [
        "MPEPTIDEK",
        "[+42]-MPEPTIDEK",
        "[+12]-MPEPTIDEK",
        "MPEPTIDEK-[+19]",
        "[+42]-MPEPTIDEK-[+19]",
        "[+12]-MPEPTIDEK-[+19]",
    ]
    assert var_mod_sequences(peps[1], mods, 2) == [
        "MSAGEK",
        "[+12]-MSAGEK",
        "MSAGEK-[+19]",
        "[+12]-MSAGEK-[+19]",
    ]
    assert var_mod_sequences(peps[2], mods, 2) == [
        "END",
        "END-[+11]",
        "[+12]-END",
        "END-[+19]",
        "[+12]-END-[+11]",
        "[+12]-END-[+19]",
    ]


def test_variable_mods():
    mods = [(Spec.parse("M"), 16.0), (Spec.parse("C"), 57.0)]
    p = peptide("GCMGCMG")
    assert var_mod_sequences(p, mods, 2) == [
        "GCMGCMG",
        "GCM[+16]GCMG",
        "GCMGCM[+16]G",
        "GC[+57]MGCMG",
        "GCMGC[+57]MG",
        "GCM[+16]GCM[+16]G",
        "GC[+57]M[+16]GCMG",
        "GCM[+16]GC[+57]MG",
        "GC[+57]MGCM[+16]G",
        "GCMGC[+57]M[+16]G",
        "GC[+57]MGC[+57]MG",
    ]


def test_variable_mods_no_effect():
    mods = [(Spec.parse("M"), 16.0), (Spec.parse("C"), 57.0)]
    assert var_mod_sequences(peptide("AAAAAAAA"), mods, 2) == ["AAAAAAAA"]


def test_variable_mods_nterm():
    mods = [(Spec.parse("^"), 42.0), (Spec.parse("M"), 16.0)]
    assert var_mod_sequences(peptide("GCMGCMG"), mods, 3) == [
        "GCMGCMG",
        "[+42]-GCMGCMG",
        "GCM[+16]GCMG",
        "GCMGCM[+16]G",
        "[+42]-GCM[+16]GCMG",
        "[+42]-GCMGCM[+16]G",
        "GCM[+16]GCM[+16]G",
        "[+42]-GCM[+16]GCM[+16]G",
    ]


def test_variable_mods_cterm():
    mods = [(Spec.parse("$"), 42.0), (Spec.parse("M"), 16.0)]
    assert var_mod_sequences(peptide("GCMGCMG"), mods, 3) == [
        "GCMGCMG",
        "GCMGCMG-[+42]",
        "GCM[+16]GCMG",
        "GCMGCM[+16]G",
        "GCM[+16]GCMG-[+42]",
        "GCMGCM[+16]G-[+42]",
        "GCM[+16]GCM[+16]G",
        "GCM[+16]GCM[+16]G-[+42]",
    ]


def test_variable_mods_multi():
    mods = [(Spec.parse("S"), 79.0), (Spec.parse("S"), 541.0)]
    assert var_mod_sequences(peptide("GGGSGGGS"), mods, 2) == [
        "GGGSGGGS",
        "GGGS[+79]GGGS",
        "GGGSGGGS[+79]",
        "GGGS[+541]GGGS",
        "GGGSGGGS[+541]",
        "GGGS[+79]GGGS[+79]",
        "GGGS[+79]GGGS[+541]",
        "GGGS[+541]GGGS[+79]",
        "GGGS[+541]GGGS[+541]",
    ]


def test_pseudo_forward():
    trypsin = EnzymeParameters(0, 3, 30, Enzyme.new("KR", "P", True, False))
    fwd = "MADEEKLPPGWEKRMSRSSGRVYYFNHITNASQWERPSGN"
    for digest in trypsin.digest(fwd, ""):
        f = Peptide.from_digest(digest)
        r = Peptide.from_digest(digest.reverse())
        assert not f.decoy and r.decoy
        assert len(f.sequence) < 4 or f.sequence != r.sequence
        assert str(r.reverse()) == str(f)


def test_apply_static_and_variable():
    p = peptide("AACAACAA")
    static = {Spec.parse("C"): 57.0}
    variable = [(Spec.parse("C"), 30.0)]
    out = [str(x) for x in p.apply(variable, static, 2)]
    assert out == [
        "AAC[+57]AAC[+57]AA",
        "AAC[+30]AAC[+57]AA",
        "AAC[+57]AAC[+30]AA",
        "AAC[+30]AAC[+30]AA",
    ]


def test_modification_sites():
    p = peptide("AACAACAA")
    acc = []
    p._push_resi(acc, Spec.parse("C"), 16.0)
    assert acc == [(("s", 2), 16.0), (("s", 5), 16.0)]
    acc = []
    p._push_resi(acc, Spec.parse("$"), 16.0)
    assert acc == [(("c", 0), 16.0)]
    acc = []
    p._push_resi(acc, Spec.parse("^"), 16.0)
    assert acc == [(("n", 0), 16.0)]

    acc = []
    for residue, mass in [("^", 12.0), ("$", 200.0), ("C", 57.0), ("A", 43.0)]:
        p._push_resi(acc, Spec.parse(residue), mass)
    assert acc == [
        (("n", 0), 12.0),
        (("c", 0), 200.0),
        (("s", 2), 57.0),
        (("s", 5), 57.0),
        (("s", 0), 43.0),
        (("s", 1), 43.0),
        (("s", 3), 43.0),
        (("s", 4), 43.0),
        (("s", 6), 43.0),
        (("s", 7), 43.0),
    ]


def test_monoisotopic_mass_f32_sequential():
    # H2O + sequential residue masses in f32
    p = peptide("PEPTIDE")
    expected = np.float32(18.010565)
    for aa in b"PEPTIDE":
        from sage_tpu.chem.mass import MONOISOTOPIC_MASSES

        expected = np.float32(expected + MONOISOTOPIC_MASSES[aa - 65])
    assert p.monoisotopic == expected


def test_cterm_mod_mass():
    # ion_series.rs:280-283: PEPTIDE + C-term 229.01 -> mono ~ 1028.37
    p = peptide("PEPTIDE").apply([], {Spec.parse("$"): 229.01}, 1)[0]
    assert abs(float(p.monoisotopic) - 1028.37) < 0.001


def test_invalid_sequence_rejected():
    assert Peptide.from_digest(Digest(False, "PEPTIDEX", "", 0, Position.INTERNAL, False)) is None
    assert Peptide.from_digest(Digest(False, "PEPTIDÉ", "", 0, Position.INTERNAL, False)) is None
