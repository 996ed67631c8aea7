"""Modification-specificity grammar.

Parity with /root/reference/crates/sage/src/modification.rs:11-155.

Grammar (max 2 chars):
  ``^``  peptide N-terminus        ``^M`` peptide N-term, residue M only
  ``$``  peptide C-terminus        ``$K`` peptide C-term, residue K only
  ``[``  protein N-terminus        ``[M`` protein N-term, residue M only
  ``]``  protein C-terminus        ``]K`` protein C-term, residue K only
  ``C``  bare residue
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional

from .mass import VALID_AA

log = logging.getLogger("sage_tpu")

PEPTIDE_N = "peptide_n"
PEPTIDE_C = "peptide_c"
PROTEIN_N = "protein_n"
PROTEIN_C = "protein_c"
RESIDUE = "residue"


@dataclasses.dataclass(frozen=True, order=True)
class ModificationSpecificity:
    kind: str
    residue: Optional[int]  # ascii byte, or None for "any residue"

    def __str__(self) -> str:
        prefix = {
            PEPTIDE_N: "^",
            PEPTIDE_C: "$",
            PROTEIN_N: "[",
            PROTEIN_C: "]",
            RESIDUE: "",
        }[self.kind]
        suffix = chr(self.residue) if self.residue is not None else ""
        return prefix + suffix

    @staticmethod
    def parse(s: str) -> "ModificationSpecificity":
        """modification.rs:66-104 — raises ValueError on invalid input."""
        if len(s) > 2:
            raise ValueError(f"modification string too long: {s}")
        if not s:
            raise ValueError("empty modification string")
        head, rest = s[0], s[1:]
        kind = {"^": PEPTIDE_N, "$": PEPTIDE_C, "[": PROTEIN_N, "]": PROTEIN_C}.get(head)
        if kind is not None:
            residue = ord(rest[0]) if rest else None
            return ModificationSpecificity(kind, residue)
        if ord(head) in VALID_AA:
            return ModificationSpecificity(RESIDUE, ord(head))
        raise ValueError(f"unrecognized residue: {head}")


def validate_mods(raw: Optional[Dict[str, float]]) -> Dict[ModificationSpecificity, float]:
    """Parse a static-mod config map, logging + skipping invalid entries.

    modification.rs:106-127. Iteration order = insertion order (the reference
    uses std HashMap order, which is unspecified; when two static mods target
    the same site the first applied wins, so we pin insertion order).
    """
    out: Dict[ModificationSpecificity, float] = {}
    for key, mass in (raw or {}).items():
        try:
            out[ModificationSpecificity.parse(key)] = float(mass)
        except ValueError as err:
            log.error("Invalid modification string: %s", err)
    return out


def validate_var_mods(
    raw: Optional[Dict[str, object]],
) -> Dict[ModificationSpecificity, List[float]]:
    """Parse a variable-mod config map; values may be scalars or lists.

    modification.rs:129-155 (scalar-or-list is handled by the CLI config
    schema in the reference — DOCS.md documents both forms).
    """
    out: Dict[ModificationSpecificity, List[float]] = {}
    for key, masses in (raw or {}).items():
        try:
            spec = ModificationSpecificity.parse(key)
        except ValueError as err:
            log.error("Skipping invalid modification string: %s", err)
            continue
        if isinstance(masses, (int, float)):
            masses = [masses]
        out[spec] = [float(m) for m in masses]
    return out
