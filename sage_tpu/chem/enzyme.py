"""In-silico enzymatic digestion.

Behavioral parity with /root/reference/crates/sage/src/enzyme.rs:
regex cleavage-site finding, missed cleavages, semi-enzymatic and
non-specific digests, per-protein dedup, digest grouping, and decoy
generation by reversing the sequence interior.

This runs on the host once per database build — it is setup code, not a
hot path, so clarity and exact semantics win over vectorization here.
"""

from __future__ import annotations

import dataclasses
import re
from enum import IntEnum
from typing import Dict, List, Optional, Tuple

from .mass import VALID_AA


class Position(IntEnum):
    """Location of a peptide within its parent protein (enzyme.rs:64-71).

    The integer order (Nterm < Cterm < Full < Internal) matches the Rust
    enum's derive(Ord) declaration order and is observable via
    ``group_digests`` sorting.
    """

    NTERM = 0
    CTERM = 1
    FULL = 2
    INTERNAL = 3


@dataclasses.dataclass
class Digest:
    """One enzymatic digest (enzyme.rs:13-26)."""

    decoy: bool
    sequence: str
    protein: str
    missed_cleavages: int
    position: Position
    semi_enzymatic: bool = False

    def reverse(self) -> "Digest":
        """Decoy by reversing the interior of the sequence (enzyme.rs:76-93):
        reverse the whole string, then swap first and last characters —
        equivalently, keep the terminal residues fixed and flip the middle."""
        if self.decoy:
            return dataclasses.replace(self)
        seq = list(reversed(self.sequence))
        if seq:
            n = len(seq) - 1
            seq[0], seq[n] = seq[n], seq[0]
        return Digest(
            decoy=True,
            sequence="".join(seq),
            protein=self.protein,
            missed_cleavages=self.missed_cleavages,
            position=self.position,
            semi_enzymatic=self.semi_enzymatic,
        )


@dataclasses.dataclass
class DigestGroup:
    """Same peptide sequence merged across proteins (enzyme.rs:28-31)."""

    reference: Digest
    proteins: List[str]


def group_digests(digests: List[Digest]) -> List[DigestGroup]:
    """Sort by (position, decoy, sequence) and merge equal runs
    (enzyme.rs:33-62)."""
    if not digests:
        return []
    digests = sorted(digests, key=lambda d: (int(d.position), d.decoy, d.sequence))
    groups: List[DigestGroup] = []
    curr = DigestGroup(reference=digests[0], proteins=[])
    for d in digests:
        ref = curr.reference
        if d.decoy == ref.decoy and d.position == ref.position and d.sequence == ref.sequence:
            curr.proteins.append(d.protein)
        else:
            curr.proteins.sort()
            groups.append(curr)
            curr = DigestGroup(reference=d, proteins=[d.protein])
    curr.proteins.sort()
    groups.append(curr)
    return groups


class Enzyme:
    """Cleavage rule (enzyme.rs:123-187).

    ``cleave``:
      * ``""``  -> handled by the caller as non-specific digestion (None)
      * ``"$"`` -> no digestion (whole protein)
      * else    -> character class of cleavage residues
    """

    def __init__(self, cleave: str, skip_suffix: str, c_terminal: bool, semi_enzymatic: bool):
        assert all(ord(c) in VALID_AA for c in cleave) or cleave == "$", (
            f"Enzyme cleavage sequence contains non-amino acid characters: {cleave}"
        )
        assert all(ord(c) in VALID_AA for c in skip_suffix), (
            f"Enzyme cleavage restriction contains non-amino acid characters: {skip_suffix}"
        )
        if cleave == "$":
            self.regex = re.compile("$")
            self.skip_suffix = frozenset()
            self.c_terminal = True
            self.semi_enzymatic = False
        else:
            self.regex = re.compile("[%s]" % cleave.replace("?", ""))
            self.skip_suffix = frozenset(skip_suffix)
            self.c_terminal = c_terminal
            self.semi_enzymatic = semi_enzymatic

    @staticmethod
    def new(
        cleave: str, skip_suffix: str, c_terminal: bool, semi_enzymatic: bool
    ) -> Optional["Enzyme"]:
        if cleave == "":
            return None
        return Enzyme(cleave, skip_suffix, c_terminal, semi_enzymatic)

    def cleavage_sites(self, sequence: str) -> List[Tuple[int, int, int, bool]]:
        """(start, end, missed_cleavages, semi) spans (enzyme.rs:189-217)."""
        sites = []
        left = 0
        for m in self.regex.finditer(sequence):
            right = m.end() if self.c_terminal else m.start()
            if right < len(sequence) and sequence[right] in self.skip_suffix:
                continue
            sites.append((left, right, 0, False))
            left = right
        sites.append((left, len(sequence), 0, False))
        return sites


@dataclasses.dataclass
class EnzymeParameters:
    """enzyme.rs:113-121."""

    missed_cleavages: int
    min_len: int
    max_len: int
    enzyme: Optional[Enzyme]

    def cleavage_sites(self, sequence: str) -> List[Tuple[int, int, int, bool]]:
        if self.enzyme is not None:
            return self.enzyme.cleavage_sites(sequence)
        # Non-specific digest: every substring of length min..=max
        # (enzyme.rs:221-239)
        sites = []
        n = len(sequence)
        for length in range(self.min_len, self.max_len + 1):
            for i in range(0, max(n - length, 0) + 1):
                sites.append((i, i + length, 0, False))
        return sites

    def _missed_cleavage_sites(self, sites, missed_cleavages):
        # enzyme.rs:241-256 — note cleavage=1 regenerates the originals; they
        # are later removed by the per-protein `seen` dedup.
        extra = []
        for cleavage in range(1, missed_cleavages + 2):
            for i in range(0, len(sites) - cleavage + 1):
                start = sites[i][0]
                end = sites[i + cleavage - 1][1]
                extra.append((start, end, cleavage - 1, False))
        sites.extend(extra)

    def _semi_enzymatic_sites(self, sites):
        # enzyme.rs:265-287
        extra = []
        for start, end, mc, _semi in sites:
            for cut in range(start, end):
                extra.append((start, cut, mc, True))
                extra.append((cut, end, mc, True))
        sites.extend(extra)

    def digest(self, sequence: str, protein: str) -> List[Digest]:
        """enzyme.rs:289-342."""
        n = len(sequence)
        sites = self.cleavage_sites(sequence)
        # Missed cleavages are disallowed for non-specific digests.
        missed_cleavages = 0 if self.enzyme is None else self.missed_cleavages
        if missed_cleavages > 0:
            self._missed_cleavage_sites(sites, missed_cleavages)
        if self.enzyme is not None and self.enzyme.semi_enzymatic:
            self._semi_enzymatic_sites(sites)

        digests: List[Digest] = []
        seen = set()
        for start, end, mc, semi in sites:
            if start > end or end > n:
                continue
            subseq = sequence[start:end]
            length = len(subseq)
            if start == 0 and end == n:
                position = Position.FULL
            elif start == 0:
                position = Position.NTERM
            elif end == n:
                position = Position.CTERM
            else:
                position = Position.INTERNAL
            if self.min_len <= length <= self.max_len and length > 0 and subseq not in seen:
                seen.add(subseq)
                digests.append(
                    Digest(
                        decoy=False,
                        sequence=subseq,
                        protein=protein,
                        missed_cleavages=mc,
                        position=position,
                        semi_enzymatic=semi,
                    )
                )
        return digests


# Config-level builder defaults (database.rs:29-57). The field-level fallbacks
# used when the "enzyme" section exists but omits keys are the From impl's:
# missed_cleavages 1, min 5, max 50, cleave "KR", restrict "", c_terminal true.
def enzyme_parameters_from_config(cfg: Optional[Dict]) -> EnzymeParameters:
    if cfg is None:
        # EnzymeBuilder::default() (database.rs:29-41)
        cfg = {
            "missed_cleavages": 0,
            "min_len": 5,
            "max_len": 50,
            "cleave_at": "KR",
            "restrict": "P",
            "c_terminal": True,
            "semi_enzymatic": False,
        }
    return EnzymeParameters(
        missed_cleavages=cfg.get("missed_cleavages", 1) if cfg.get("missed_cleavages") is not None else 1,
        min_len=cfg.get("min_len") if cfg.get("min_len") is not None else 5,
        max_len=cfg.get("max_len") if cfg.get("max_len") is not None else 50,
        enzyme=Enzyme.new(
            cfg.get("cleave_at") if cfg.get("cleave_at") is not None else "KR",
            cfg.get("restrict") if cfg.get("restrict") is not None else "",
            cfg.get("c_terminal") if cfg.get("c_terminal") is not None else True,
            cfg.get("semi_enzymatic") if cfg.get("semi_enzymatic") is not None else False,
        ),
    )
