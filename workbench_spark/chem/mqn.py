"""Molecular Quantum Numbers — the 42 MQN counts of Nguyen, Blum,
van Deursen & Reymond, *ChemMedChem* 2009, 4:1803-1805 ("Classification
of Organic Molecules by Molecular Quantum Numbers").

Reference parity: the reference gets MQN-style count descriptors through
RDKit (rdMolDescriptors, used by mol_descriptors.py); this module derives
the same 42 published counts directly from the parsed SMILES graph.

The 42 counts, grouped as in the paper:

- atom counts (12): c, f, cl, br, i, s, p, acyclic/cyclic N (an/cn),
  acyclic/cyclic O (ao/co), heavy-atom count (hac)
- bond counts (7): acyclic/cyclic single, double, triple bonds
  (asb/adb/atb/csb/cdb/ctb) and rotatable bonds (rbc)
- polarity counts (6): H-bond donor atoms/sites (hbd/hbdm), acceptor
  atoms/sites (hba/hbam), positive/negative charge counts (pos/neg)
- topology counts (17): acyclic mono/di/tri/tetravalent nodes
  (asv/adv/atv/aqv), cyclic di/tri/tetravalent nodes (cdv/ctv/cqv),
  ring-size counts r3..r9 and rg10 (SSSR), atoms/bonds shared by >= 2
  rings (afr/bfr)

Definitional choices, documented where the paper's main text leaves a
convention open (divergence from RDKit's MQN vector possible on these):

- Bond single/double/triple buckets use the KEKULE form: aromatic systems
  written lowercase are kekulized here by a backtracking perfect matching
  over the atoms that require a double bond (aromatic C and pyridine-type
  N; pyrrole-type N [has H or 3 ring connections], O and S contribute a
  lone pair and take no double bond). Benzene -> 3 csb + 3 cdb,
  naphthalene -> 6 csb + 5 cdb.
- hbd / hba are the Lipinski atom counts already used by the descriptor
  block (N/O with >= 1 H; all N+O). hbdm counts every H on a donor atom;
  hbam counts acceptor lone pairs (O: 2, N: 1, each reduced by positive /
  raised by negative formal charge, floored at 0).
- pos/neg count formally charged atoms plus pH-7 ionizable groups:
  carboxylic acids (neg) and non-amide amines (pos), reusing the
  acid/base perception of chem/topology.acid_base_groups.
- Valence buckets use the heavy-atom degree; aqv/cqv absorb degree > 4.
"""

from __future__ import annotations

from workbench_spark.chem.smiles import Mol

MQN_NAMES = (
    "mqn_c", "mqn_f", "mqn_cl", "mqn_br", "mqn_i", "mqn_s", "mqn_p",
    "mqn_an", "mqn_cn", "mqn_ao", "mqn_co", "mqn_hac",
    "mqn_asb", "mqn_adb", "mqn_atb", "mqn_csb", "mqn_cdb", "mqn_ctb",
    "mqn_rbc",
    "mqn_hbd", "mqn_hbdm", "mqn_hba", "mqn_hbam", "mqn_pos", "mqn_neg",
    "mqn_asv", "mqn_adv", "mqn_atv", "mqn_aqv",
    "mqn_cdv", "mqn_ctv", "mqn_cqv",
    "mqn_r3", "mqn_r4", "mqn_r5", "mqn_r6", "mqn_r7", "mqn_r8", "mqn_r9",
    "mqn_rg10", "mqn_afr", "mqn_bfr",
)


def kekulize_orders(mol: Mol) -> list[int]:
    """Bond orders with aromatic bonds resolved to a Kekulé assignment.

    Returns one order per bond (parallel to mol.bonds). Non-aromatic bonds
    keep their parsed order. For each aromatic system, the atoms that must
    carry exactly one double bond (aromatic carbons — carbonyl-demoted ones
    excluded by the parser — and pyridine-type nitrogens: no H, exactly two
    ring connections) are perfectly matched over the aromatic bonds by
    backtracking; remaining aromatic bonds are single. Aromatic rings are
    small, so the backtracking is bounded (worst case ~2^rings choices,
    rings being SSSR-sized).
    """
    orders = [b.order for b in mol.bonds]
    arom_idx = [i for i, b in enumerate(mol.bonds) if b.aromatic]
    if not arom_idx:
        return orders

    def needs_double(ai: int) -> bool:
        a = mol.atoms[ai]
        if not (a.aromatic or a.demoted_aromatic):
            return False
        if a.symbol == "C":
            return a.aromatic  # demoted (carbonyl) carbons keep their C=O
        if a.symbol == "N":
            arom_deg = sum(
                1 for _, b in mol.neighbors(ai) if b.aromatic
            )
            return a.h_count == 0 and a.charge == 0 and arom_deg == 2
        return False  # O, S, pyrrole-type N: lone-pair contributors

    need = {i for i in range(len(mol.atoms)) if needs_double(i)}
    # adjacency over aromatic bonds restricted to atoms needing a double
    matched: dict[int, int] = {}
    chosen: set[int] = set()
    todo = sorted(need)

    def backtrack(pos: int) -> bool:
        while pos < len(todo) and todo[pos] in matched:
            pos += 1
        if pos == len(todo):
            return True
        ai = todo[pos]
        for nb, b in mol.neighbors(ai):
            if not b.aromatic or nb not in need or nb in matched:
                continue
            bi = mol.bonds.index(b)
            matched[ai] = nb
            matched[nb] = ai
            chosen.add(bi)
            if backtrack(pos + 1):
                return True
            del matched[ai]
            del matched[nb]
            chosen.discard(bi)
        return False

    if not backtrack(0):
        # no perfect Kekulé matching (charged/odd systems): leave aromatic
        # bonds as written (order 1) rather than guess
        return orders
    for i in arom_idx:
        orders[i] = 2 if i in chosen else 1
    return orders


def mqn_descriptors(mol: Mol) -> dict[str, int]:
    """The 42 MQN counts for a parsed molecule (keys = MQN_NAMES)."""
    from workbench_spark.chem.descriptors import num_rotatable_bonds
    from workbench_spark.chem.topology import acid_base_groups

    out = dict.fromkeys(MQN_NAMES, 0)

    # ---- atom counts
    for a in mol.atoms:
        sym = a.symbol
        if sym == "C":
            out["mqn_c"] += 1
        elif sym == "F":
            out["mqn_f"] += 1
        elif sym == "Cl":
            out["mqn_cl"] += 1
        elif sym == "Br":
            out["mqn_br"] += 1
        elif sym == "I":
            out["mqn_i"] += 1
        elif sym == "S":
            out["mqn_s"] += 1
        elif sym == "P":
            out["mqn_p"] += 1
        elif sym == "N":
            out["mqn_cn" if a.in_ring else "mqn_an"] += 1
        elif sym == "O":
            out["mqn_co" if a.in_ring else "mqn_ao"] += 1
    out["mqn_hac"] = len(mol.atoms)

    # ---- bond counts (Kekulé orders)
    orders = kekulize_orders(mol)
    for b, o in zip(mol.bonds, orders):
        if o == 1:
            key = "mqn_csb" if b.in_ring else "mqn_asb"
        elif o == 2:
            key = "mqn_cdb" if b.in_ring else "mqn_adb"
        elif o == 3:
            key = "mqn_ctb" if b.in_ring else "mqn_atb"
        else:
            continue  # quadruple: outside the MQN vocabulary
        out[key] += 1
    out["mqn_rbc"] = num_rotatable_bonds(mol)

    # ---- polarity counts
    for a in mol.atoms:
        if a.symbol in ("N", "O"):
            if a.h_count > 0:
                out["mqn_hbd"] += 1
                out["mqn_hbdm"] += a.h_count
            out["mqn_hba"] += 1
            lone = 2 if a.symbol == "O" else 1
            out["mqn_hbam"] += max(0, lone - a.charge)
        if a.charge > 0:
            out["mqn_pos"] += a.charge
        elif a.charge < 0:
            out["mqn_neg"] += -a.charge
    groups = acid_base_groups(mol)
    out["mqn_pos"] += (
        groups["n_amine_primary"]
        + groups["n_amine_secondary"]
        + groups["n_amine_tertiary"]
    )
    out["mqn_neg"] += groups["n_carboxylic_acid"]

    # ---- topology counts
    degree = [0] * len(mol.atoms)
    for b in mol.bonds:
        degree[b.a] += 1
        degree[b.b] += 1
    for a in mol.atoms:
        d = degree[a.idx]
        if a.in_ring:
            if d == 2:
                out["mqn_cdv"] += 1
            elif d == 3:
                out["mqn_ctv"] += 1
            elif d >= 4:
                out["mqn_cqv"] += 1
        else:
            if d == 1:
                out["mqn_asv"] += 1
            elif d == 2:
                out["mqn_adv"] += 1
            elif d == 3:
                out["mqn_atv"] += 1
            elif d >= 4:
                out["mqn_aqv"] += 1

    ring_atom_count = dict.fromkeys(range(len(mol.atoms)), 0)
    ring_bond_count: dict[frozenset, int] = {}
    for ring in mol.rings:
        k = len(ring)
        if 3 <= k <= 9:
            out[f"mqn_r{k}"] += 1
        elif k >= 10:
            out["mqn_rg10"] += 1
        for i in range(k):
            ring_atom_count[ring[i]] += 1
            pair = frozenset((ring[i], ring[(i + 1) % k]))
            ring_bond_count[pair] = ring_bond_count.get(pair, 0) + 1
    out["mqn_afr"] = sum(1 for v in ring_atom_count.values() if v >= 2)
    out["mqn_bfr"] = sum(1 for v in ring_bond_count.values() if v >= 2)
    return out
