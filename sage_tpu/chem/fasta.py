"""FASTA parsing and protein-level digestion.

Parity with /root/reference/crates/sage/src/fasta.rs.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

from .enzyme import Digest, EnzymeParameters


@dataclasses.dataclass
class Fasta:
    targets: List[Tuple[str, str]]  # (accession, sequence)
    decoy_tag: str
    generate_decoys: bool

    @staticmethod
    def parse(contents: str, decoy_tag: str, generate_decoys: bool) -> "Fasta":
        """fasta.rs:16-56 — accession is the first whitespace token of the
        header; entries whose accession contains the decoy tag are dropped
        when internal decoy generation is enabled."""
        targets: List[Tuple[str, str]] = []
        last_id = ""
        seq_parts: List[str] = []

        def flush():
            if seq_parts:
                acc = last_id.split(None, 1)[0] if last_id.split() else ""
                seq = "".join(seq_parts)
                seq_parts.clear()
                if decoy_tag not in acc or not generate_decoys:
                    targets.append((acc, seq))

        for line in contents.splitlines():
            if not line:
                continue
            line = line.strip()
            if line.startswith(">"):
                flush()
                last_id = line[1:]
            else:
                seq_parts.append(line)
        flush()
        return Fasta(targets=targets, decoy_tag=decoy_tag, generate_decoys=generate_decoys)

    def digest(self, enzyme: EnzymeParameters) -> List[Digest]:
        """fasta.rs:58-79 — decoy-tagged proteins are dropped when decoys are
        generated internally, otherwise their digests are marked as decoys."""
        out: List[Digest] = []
        for protein, sequence in self.targets:
            for digest in enzyme.digest(sequence, protein):
                if self.decoy_tag in protein:
                    if not self.generate_decoys:
                        digest.decoy = True
                        out.append(digest)
                else:
                    out.append(digest)
        return out

    def iter_chunks(self, chunk_size: int):
        """fasta.rs:81-89 — used by prefilter mode."""
        for i in range(0, len(self.targets), chunk_size):
            yield Fasta(
                targets=self.targets[i : i + chunk_size],
                decoy_tag=self.decoy_tag,
                generate_decoys=self.generate_decoys,
            )
