"""Real ECFP (Morgan) circular fingerprints from the SMILES graph.

Implements the published ECFP algorithm (Rogers & Hahn, J. Chem. Inf.
Model. 2010) — the same construction RDKit's ``GetMorganFingerprint``
uses (reference: ``utils/chem_utils/fingerprints.py:27-197``):

1. initial atom identifiers from Daylight-style invariants (heavy
   degree, element, charge, attached H, ring membership, aromaticity);
2. ``radius`` rounds of neighborhood updates — each round hashes the
   atom's own identifier with the sorted (bond-order, neighbor-id)
   list;
3. environment deduplication by covered-bond-set (two features whose
   circular environments span the same bonds collapse to the earlier /
   smaller one);
4. fold to ``n_bits`` (bit fp) or count occurrences per folded slot
   (count fp).

Identifiers hash via blake2b-64 — stable across processes and Python
versions (``hash()`` is salted; never used here). Bit values differ from
RDKit's (different hash function) but the structural semantics — which
atoms/environments collide, Tanimoto ordering — are the real ECFP ones.
"""

from __future__ import annotations

import hashlib
import struct

from workbench_spark.chem.smiles import Mol, SmilesError, parse_smiles


def _h64(*vals: int) -> int:
    """Stable 64-bit hash of an int tuple."""
    raw = struct.pack(f"<{len(vals)}q", *vals)
    return int.from_bytes(
        hashlib.blake2b(raw, digest_size=8).digest(), "little", signed=True
    )


def _initial_invariants(mol: Mol) -> list[int]:
    out = []
    adj = mol.adjacency
    for a in mol.atoms:
        heavy_deg = len(adj[a.idx])
        out.append(
            _h64(
                heavy_deg,
                # proxy for atomic number: stable element-symbol hash
                int.from_bytes(a.symbol.encode().ljust(4, b"\0"), "little"),
                a.charge,
                a.h_count,
                int(a.in_ring),
                int(a.aromatic),
            )
        )
    return out


def ecfp_features(smiles: str, radius: int = 2) -> dict[int, int] | None:
    """Feature-id → count map (unfolded). None if unparseable."""
    try:
        mol = parse_smiles(smiles)
    except SmilesError:
        return None
    adj = mol.adjacency
    bond_index = {}
    for bi, b in enumerate(mol.bonds):
        bond_index[frozenset((b.a, b.b))] = bi
    ids = _initial_invariants(mol)
    # feature: (identifier, radius, frozenset of covered bond indices)
    feats: list[tuple[int, int, frozenset[int]]] = [
        (ids[i], 0, frozenset()) for i in range(len(mol.atoms))
    ]
    env: list[frozenset[int]] = [frozenset() for _ in mol.atoms]
    for r in range(1, radius + 1):
        new_ids = []
        new_env = []
        for i in range(len(mol.atoms)):
            nbrs = sorted(
                (
                    (2 if b.aromatic else b.order, ids[nb])
                    for nb, b in adj[i]
                ),
            )
            flat = [r, ids[i]]
            covered = set(env[i])
            for order, nid in nbrs:
                flat.extend((order, nid))
            for nb, b in adj[i]:
                covered.add(bond_index[frozenset((b.a, b.b))])
                covered |= env[nb]
            new_ids.append(_h64(*flat))
            new_env.append(frozenset(covered))
        ids = new_ids
        env = new_env
        for i in range(len(mol.atoms)):
            feats.append((ids[i], r, env[i]))
    # dedup: environments covering the same bond set collapse (keep the
    # lowest radius; ties by identifier for determinism)
    best: dict[frozenset[int], tuple[int, int]] = {}
    for ident, r, bonds in feats:
        if r == 0:
            continue  # radius-0 features always kept (atom types)
        cur = best.get(bonds)
        if cur is None or (r, ident) < cur:
            best[bonds] = (r, ident)
    counts: dict[int, int] = {}
    for ident, r, bonds in feats:
        if r == 0 or best[bonds] == (r, ident):
            counts[ident] = counts.get(ident, 0) + 1
    return counts


def morgan_bits(smiles: str, n_bits: int = 1024, radius: int = 2) -> str | None:
    """Folded bit fingerprint as a '0'/'1' string (reference bitstring
    format, fingerprints.py:117-140)."""
    feats = ecfp_features(smiles, radius)
    if feats is None:
        return None
    bits = bytearray(b"0" * n_bits)
    for ident in feats:
        bits[ident % n_bits] = ord("1")  # Python %: result is non-negative
    return bits.decode()


def morgan_counts(
    smiles: str, n_bits: int = 1024, radius: int = 2
) -> dict[int, int] | None:
    """Folded count fingerprint: nonzero dim → count (uint8-capped, the
    reference's ADMET-modeling form, fingerprints.py:28-114)."""
    feats = ecfp_features(smiles, radius)
    if feats is None:
        return None
    out: dict[int, int] = {}
    for ident, c in feats.items():
        slot = ident % n_bits
        out[slot] = min(out.get(slot, 0) + c, 255)
    return out
