"""Compound — per-molecule record object (reference api/compound.py:10-60).

Same dataclass surface: id/smiles/tags/meta, add_tag/remove_tag/add_meta,
details(), image(), __str__. ``image()`` renders a real (if minimal) SVG
depiction from the pure-Python molecular graph — a circular atom layout
with bond lines — instead of the reference's RDKit raster path
(``svg_from_smiles``); invalid SMILES yields an SVG error card, matching
the reference's placeholder behavior.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass, field


@dataclass
class Compound:
    """Store details about an individual compound."""

    id: str
    smiles: str | None = None
    tags: list[str] = field(default_factory=list)
    meta: dict = field(default_factory=dict)
    log: logging.Logger = field(
        default_factory=lambda: logging.getLogger("workbench_spark"), init=False
    )

    def add_tag(self, tag: str) -> None:
        if tag not in self.tags:
            self.tags.append(tag)

    def remove_tag(self, tag: str) -> None:
        if tag in self.tags:
            self.tags.remove(tag)

    def add_meta(self, key: str, value) -> None:
        self.meta[key] = value

    def details(self) -> dict:
        return {"smiles": self.smiles, "tags": self.tags, "meta": self.meta}

    def image(self, width: int = 300, height: int = 200) -> str:
        """SVG depiction (reference: svg_from_smiles via RDKit drawing).
        Here: heavy atoms on a circle, bonds as lines, hetero-atom labels
        — a real structural sketch computed from the parsed graph."""
        from workbench_spark.chem.smiles import SmilesError, parse_smiles

        header = (
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
            f'height="{height}" viewBox="0 0 {width} {height}">'
        )
        if not self.smiles:
            return header + '<text x="10" y="20">no structure</text></svg>'
        try:
            mol = parse_smiles(self.smiles)
        except SmilesError:
            return header + '<text x="10" y="20">invalid SMILES</text></svg>'
        n = len(mol.atoms)
        cx, cy = width / 2, height / 2
        r = 0.4 * min(width, height)
        pos = [
            (cx + r * math.cos(2 * math.pi * i / max(n, 1)),
             cy + r * math.sin(2 * math.pi * i / max(n, 1)))
            for i in range(n)
        ]
        parts = [header]
        for b in mol.bonds:
            (x1, y1), (x2, y2) = pos[b.a], pos[b.b]
            w = 2 if (b.order == 2 or b.aromatic) else 1
            parts.append(
                f'<line x1="{x1:.1f}" y1="{y1:.1f}" x2="{x2:.1f}" '
                f'y2="{y2:.1f}" stroke="black" stroke-width="{w}"/>'
            )
        for a, (x, y) in zip(mol.atoms, pos):
            if a.symbol != "C":
                parts.append(
                    f'<text x="{x:.1f}" y="{y:.1f}" text-anchor="middle" '
                    f'font-size="12">{a.symbol}</text>'
                )
        parts.append("</svg>")
        return "".join(parts)

    def __str__(self) -> str:
        out = (
            f"Compound({self.id})\n  SMILES: {self.smiles}\n"
            f"  Tags: {', '.join(self.tags) if self.tags else 'None'}"
        )
        return out + f"\n  Meta: {self.meta if self.meta else 'None'}"
