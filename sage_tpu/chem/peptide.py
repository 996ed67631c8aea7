"""Peptide construction: modifications, decoy reversal, display format.

Parity with /root/reference/crates/sage/src/peptide.rs. Host-side database
build code — the columnar device tables are assembled in
``sage_tpu.index.builder`` from these objects.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional, Tuple

import numpy as np

from .enzyme import Digest, DigestGroup, Position
from .mass import H2O, MONOISOTOPIC_MASSES
from .modification import (
    PEPTIDE_C,
    PEPTIDE_N,
    PROTEIN_C,
    PROTEIN_N,
    RESIDUE,
    ModificationSpecificity,
)

F32 = np.float32

# Site encoding for variable-mod application (peptide.rs:335-340):
# ("n", 0) = peptide N-term, ("c", 0) = peptide C-term, ("s", idx) = residue.
_NTERM = ("n", 0)
_CTERM = ("c", 0)


def _fmt_mass(m: float) -> str:
    """Rust `{:+}` Display for f32: shortest round-trip decimal, no trailing
    '.0', explicit sign (peptide.rs:390-407)."""
    s = np.format_float_positional(F32(m), trim="-")
    return s if s.startswith("-") else "+" + s


class Peptide:
    __slots__ = (
        "decoy",
        "sequence",
        "modifications",
        "nterm",
        "cterm",
        "monoisotopic",
        "missed_cleavages",
        "semi_enzymatic",
        "position",
        "proteins",
    )

    def __init__(
        self,
        decoy: bool,
        sequence: bytes,
        modifications: List[np.float32],
        nterm: Optional[np.float32],
        cterm: Optional[np.float32],
        monoisotopic: np.float32,
        missed_cleavages: int,
        semi_enzymatic: bool,
        position: Position,
        proteins: List[str],
    ):
        self.decoy = decoy
        self.sequence = sequence
        self.modifications = modifications
        self.nterm = nterm
        self.cterm = cterm
        self.monoisotopic = monoisotopic
        self.missed_cleavages = missed_cleavages
        self.semi_enzymatic = semi_enzymatic
        self.position = position
        self.proteins = proteins

    # -- construction -----------------------------------------------------

    @staticmethod
    def from_digest(
        digest: Digest, proteins: Optional[List[str]] = None,
        _mono: Optional[np.float32] = None,
    ) -> Optional["Peptide"]:
        """peptide.rs:357-388: mass = H2O + sum(residues) accumulated
        sequentially in f32; None for non-ASCII or unknown residues.
        ``_mono`` short-circuits the per-residue loop with a mass the
        caller already computed with the same sequential-f32 op order
        (see batch_monoisotopic)."""
        try:
            seq = digest.sequence.encode("ascii")
        except UnicodeEncodeError:
            return None
        if _mono is not None:
            mass = _mono
        else:
            mass = F32(H2O)
            for b in seq:
                mono = MONOISOTOPIC_MASSES[b - 65] if 65 <= b <= 90 else F32(0.0)
                if mono == 0.0:
                    return None
                mass = F32(mass + mono)
        return Peptide(
            decoy=digest.decoy,
            sequence=seq,
            modifications=[F32(0.0)] * len(seq),
            nterm=None,
            cterm=None,
            monoisotopic=mass,
            missed_cleavages=digest.missed_cleavages,
            semi_enzymatic=digest.semi_enzymatic,
            position=digest.position,
            proteins=list(proteins) if proteins is not None else [digest.protein],
        )

    @staticmethod
    def from_group(
        group: DigestGroup, _mono: Optional[np.float32] = None
    ) -> Optional["Peptide"]:
        return Peptide.from_digest(
            group.reference, proteins=group.proteins, _mono=_mono
        )

    @staticmethod
    def batch_monoisotopic(seqs: List[str]):
        """Sequential-f32 H2O + residue masses for many sequences at
        once (the same op order as the from_digest loop, via the native
        row-cumsum helper). Returns (mono f32 [N], ok bool [N]) — ok is
        False exactly where the scalar loop returns None (non-ASCII or
        unknown residue)."""
        from ..native import seq_f32_cumsum_rows

        n = len(seqs)
        if n == 0:
            return np.zeros(0, np.float32), np.zeros(0, bool)
        lens = np.fromiter((len(s) for s in seqs), np.int64, n)
        L = max(int(lens.max()), 1)
        mat = np.zeros((n, L), np.uint8)
        ok = np.ones(n, bool)
        for i, s in enumerate(seqs):
            try:
                b = s.encode("ascii")
            except UnicodeEncodeError:
                ok[i] = False
                continue
            mat[i, : len(b)] = np.frombuffer(b, np.uint8)
        is_res = (mat >= 65) & (mat <= 90)
        res = np.where(
            is_res,
            MONOISOTOPIC_MASSES[np.clip(mat.astype(np.int32) - 65, 0, 25)],
            np.float32(0.0),
        ).astype(np.float32)
        pos_ok = ~((res == 0.0) & (
            np.arange(L)[None, :] < lens[:, None]
        ))
        ok &= pos_ok.all(axis=1)
        init = np.full(n, F32(H2O), np.float32)
        cum = seq_f32_cumsum_rows(res, init, lens.astype(np.int32))
        mono = cum[np.arange(n), np.maximum(lens - 1, 0)]
        mono = np.where(lens > 0, mono, F32(H2O)).astype(np.float32)
        return mono, ok

    def clone(self) -> "Peptide":
        return Peptide(
            decoy=self.decoy,
            sequence=self.sequence,
            modifications=list(self.modifications),
            nterm=self.nterm,
            cterm=self.cterm,
            monoisotopic=self.monoisotopic,
            missed_cleavages=self.missed_cleavages,
            semi_enzymatic=self.semi_enzymatic,
            position=self.position,
            proteins=self.proteins,
        )

    # -- labels / display --------------------------------------------------

    def label(self) -> int:
        return -1 if self.decoy else 1

    def proteins_str(self, decoy_tag: str, generate_decoys: bool) -> str:
        """peptide.rs:81-96."""
        if self.decoy and generate_decoys:
            return ";".join(decoy_tag + p for p in self.proteins)
        return ";".join(self.proteins)

    def __str__(self) -> str:
        out = []
        if self.nterm is not None:
            out.append(f"[{_fmt_mass(self.nterm)}]-")
        for c, m in zip(self.sequence, self.modifications):
            if m != 0.0:
                out.append(f"{chr(c)}[{_fmt_mass(m)}]")
            else:
                out.append(chr(c))
        if self.cterm is not None:
            out.append(f"-[{_fmt_mass(self.cterm)}]")
        return "".join(out)

    def __repr__(self) -> str:
        return f"Peptide({self!s}, mono={self.monoisotopic}, decoy={self.decoy})"

    # -- modifications ------------------------------------------------------

    def _modification_mass(self) -> np.float32:
        """peptide.rs:129-133 — sequential f32: (sum(mods) + nterm) + cterm."""
        acc = F32(0.0)
        for m in self.modifications:
            acc = F32(acc + m)
        acc = F32(acc + (self.nterm if self.nterm is not None else F32(0.0)))
        acc = F32(acc + (self.cterm if self.cterm is not None else F32(0.0)))
        return acc

    def _apply_site(self, site: Tuple[str, int], mass: float):
        """peptide.rs:136-154 — never overwrite an existing modification."""
        kind, idx = site
        if kind == "n":
            if self.nterm is None:
                self.nterm = F32(mass)
        elif kind == "c":
            if self.cterm is None:
                self.cterm = F32(mass)
        else:
            if self.modifications[idx] == 0.0:
                self.modifications[idx] = F32(self.modifications[idx] + F32(mass))

    def _push_resi(self, acc: list, target: ModificationSpecificity, mass: float):
        """Collect candidate variable-mod sites (peptide.rs:156-208)."""
        first = self.sequence[0] if self.sequence else 0
        last = self.sequence[-1] if self.sequence else 0
        at_protein_n = self.position in (Position.NTERM, Position.FULL)
        at_protein_c = self.position in (Position.CTERM, Position.FULL)
        k, r = target.kind, target.residue
        if k == PEPTIDE_N:
            if r is None:
                acc.append((_NTERM, mass))
            elif r == first:
                acc.append((("s", 0), mass))
        elif k == PEPTIDE_C:
            if r is None:
                acc.append((_CTERM, mass))
            elif r == last:
                acc.append((("s", max(len(self.sequence) - 1, 0)), mass))
        elif k == PROTEIN_N:
            if at_protein_n:
                if r is None:
                    acc.append((_NTERM, mass))
                elif r == first:
                    acc.append((("s", 0), mass))
        elif k == PROTEIN_C:
            if at_protein_c:
                if r is None:
                    acc.append((_CTERM, mass))
                elif r == last:
                    acc.append((("s", max(len(self.sequence) - 1, 0)), mass))
        elif k == RESIDUE:
            for idx, residue in enumerate(self.sequence):
                if r == residue:
                    acc.append((("s", idx), mass))

    def _static_mods(self, target: ModificationSpecificity, mass: float):
        """peptide.rs:210-255 — same site table as variable mods, but applied
        directly (never overwriting an existing modification)."""
        sites: list = []
        self._push_resi(sites, target, mass)
        for site, m in sites:
            self._apply_site(site, m)

    def apply(
        self,
        variable_mods: List[Tuple[ModificationSpecificity, float]],
        static_mods: Dict[ModificationSpecificity, float],
        combinations: int,
    ) -> List["Peptide"]:
        """Apply variable mods (as k-combinations of candidate sites), then
        static mods; update the monoisotopic mass (peptide.rs:257-305)."""
        if not variable_mods:
            for target, mass in static_mods.items():
                self._static_mods(target, mass)
            self.monoisotopic = F32(self.monoisotopic + self._modification_mass())
            return [self]

        mods: list = []
        for spec, mass in variable_mods:
            self._push_resi(mods, spec, mass)

        modified = [self.clone()]
        for n in range(1, combinations + 1):
            for combination in itertools.combinations(mods, n):
                # At most one N-term and one C-term mod per combination
                n_ct = sum(1 for site, _ in combination if site == _NTERM)
                c_ct = sum(1 for site, _ in combination if site == _CTERM)
                if n_ct > 1 or c_ct > 1:
                    continue
                # No duplicate sites
                sites = [site for site, _ in combination]
                if len(set(sites)) != len(sites):
                    continue
                peptide = self.clone()
                for site, mass in combination:
                    peptide._apply_site(site, mass)
                modified.append(peptide)

        for peptide in modified:
            for target, mass in static_mods.items():
                peptide._static_mods(target, mass)
            peptide.monoisotopic = F32(peptide.monoisotopic + peptide._modification_mass())
        return modified

    # -- decoys --------------------------------------------------------------

    def reverse(self) -> "Peptide":
        """Flip decoy status, reversing the sequence/mod interior
        (peptide.rs:307-318)."""
        pep = self.clone()
        pep.decoy = not self.decoy
        n = len(pep.sequence) - 1
        if n > 1:
            seq = bytearray(pep.sequence)
            seq[1:n] = seq[1:n][::-1]
            pep.sequence = bytes(seq)
            pep.modifications[1:n] = pep.modifications[1:n][::-1]
        return pep

    # -- ordering -------------------------------------------------------------

    def sort_key(self):
        """Sort key used by the database build (database.rs:226-230 +
        peptide.rs:34-52): mass, then sequence, mods, nterm, cterm.
        Option<f32> ordering: None < Some(x)."""
        nterm = (0, 0.0) if self.nterm is None else (1, float(self.nterm))
        cterm = (0, 0.0) if self.cterm is None else (1, float(self.cterm))
        return (
            float(self.monoisotopic),
            self.sequence,
            tuple(float(m) for m in self.modifications),
            nterm,
            cterm,
        )

    def dedup_key(self):
        """Equality used when merging duplicate peptides (database.rs:231-246)."""
        return (
            float(self.monoisotopic),
            self.sequence,
            tuple(float(m) for m in self.modifications),
            None if self.nterm is None else float(self.nterm),
            None if self.cterm is None else float(self.cterm),
        )
