"""Golden-value tests for the pure-Python chemistry engine
(workbench_spark.chem): SMILES parsing, descriptors vs published
RDKit/PubChem numbers, ECFP fingerprints, Morgan canonicalization.

No Spark needed — the engine is plain Python executed inside pandas UDFs.
"""

from __future__ import annotations

import pytest

from workbench_spark.chem.canon import canonical_smiles
from workbench_spark.chem.descriptors import compute_descriptors
from workbench_spark.chem.fingerprints import morgan_bits, morgan_counts
from workbench_spark.chem.smiles import SmilesError, mol_formula_weight, parse_smiles

# (name, smiles, expected MW) — MW from standard atomic weights
MW_CASES = [
    ("ethanol", "CCO", 46.07),
    ("benzene-aromatic", "c1ccccc1", 78.11),
    ("benzene-kekule", "C1=CC=CC=C1", 78.11),
    ("aspirin", "CC(=O)Oc1ccccc1C(=O)O", 180.16),
    ("caffeine", "Cn1cnc2c1c(=O)n(C)c(=O)n2C", 194.19),
    ("pyridine", "c1ccncc1", 79.10),
    ("pyrrole", "c1cc[nH]c1", 67.09),
    ("imidazole", "c1c[nH]cn1", 68.08),
    ("furan", "c1ccoc1", 68.07),
    ("thiophene", "c1ccsc1", 84.14),
    ("ibuprofen", "CC(C)Cc1ccc(cc1)C(C)C(=O)O", 206.28),
    ("paracetamol", "CC(=O)Nc1ccc(O)cc1", 151.16),
    ("nicotine", "CN1CCC[C@H]1c1cccnc1", 162.23),
    ("glucose", "C(C1C(C(C(C(O1)O)O)O)O)O", 180.16),
    ("sulfanilamide", "c1cc(ccc1N)S(=O)(=O)N", 172.20),
    ("nitrobenzene", "c1ccc(cc1)[N+](=O)[O-]", 123.11),
    ("TNT", "Cc1c(cc(cc1[N+](=O)[O-])[N+](=O)[O-])[N+](=O)[O-]", 227.13),
    ("naphthalene", "c1ccc2ccccc2c1", 128.17),
    ("ammonium", "[NH4+]", 18.04),
]


@pytest.mark.parametrize("name,smi,mw", MW_CASES, ids=[c[0] for c in MW_CASES])
def test_molecular_weight(name, smi, mw):
    assert mol_formula_weight(parse_smiles(smi)) == pytest.approx(mw, abs=0.05)


# TPSA golden values are the RDKit/PubChem published numbers (Ertl 2000,
# N/O contributions); HBD/HBA are the Lipinski definitions.
DESC_CASES = [
    ("aspirin", "CC(=O)Oc1ccccc1C(=O)O",
     dict(tpsa=63.60, numhdonors=1, numhacceptors=4, numrotatablebonds=3,
          ringcount=1, numaromaticrings=1)),
    ("caffeine", "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
     dict(tpsa=58.44, numhdonors=0, numhacceptors=6, ringcount=2,
          numaromaticrings=1)),  # pyrimidinedione ring demoted, imidazole kept
    ("paracetamol", "CC(=O)Nc1ccc(O)cc1",
     dict(tpsa=49.33, numhdonors=2, numhacceptors=3)),
    ("ibuprofen", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
     dict(tpsa=37.30, numhdonors=1, numhacceptors=2, numrotatablebonds=4)),
    ("nicotine", "CN1CCC[C@H]1c1cccnc1",
     dict(tpsa=16.13, numhdonors=0, numhacceptors=2, numstereocenters=1)),
    ("glucose", "C(C1C(C(C(C(O1)O)O)O)O)O",
     dict(tpsa=110.38, numhdonors=5, numhacceptors=6)),
    ("nitrobenzene", "c1ccc(cc1)[N+](=O)[O-]", dict(tpsa=45.82)),
    ("benzamide", "c1ccc(cc1)C(=O)N", dict(tpsa=43.09, numhdonors=1)),
    ("uracil", "O=c1cc[nH]c(=O)[nH]1", dict(numaromaticrings=0)),
    ("TNT", "Cc1c(cc(cc1[N+](=O)[O-])[N+](=O)[O-])[N+](=O)[O-]",
     dict(tpsa=137.46)),
    ("morphine", "CN1CC[C@]23c4c5ccc(O)c4O[C@H]2[C@@H](O)C=C[C@H]3[C@H]1C5",
     dict(numhdonors=2, numhacceptors=4)),
    ("sertraline", "CN[C@H]1CC[C@@H](c2ccc(Cl)c(Cl)c2)c2ccccc21",
     dict(tpsa=12.03, numhdonors=1)),
]


@pytest.mark.parametrize("name,smi,exp", DESC_CASES, ids=[c[0] for c in DESC_CASES])
def test_descriptor_golden_values(name, smi, exp):
    d = compute_descriptors(smi)
    assert d is not None
    for k, v in exp.items():
        assert d[k] == v, f"{name}.{k}: got {d[k]}, expected {v}"


def test_descriptors_invalid_smiles():
    assert compute_descriptors("not a molecule ((") is None
    assert compute_descriptors("") is None
    with pytest.raises(SmilesError):
        parse_smiles("C1CC")  # unclosed ring


def test_descriptors_written_form_invariance():
    """Kekulé vs aromatic notation must give identical descriptors."""
    pairs = [
        ("Cn1cnc2c1c(=O)n(C)c(=O)n2C", "CN1C=NC2=C1C(=O)N(C)C(=O)N2C"),
        ("c1cc[nH]c1", "C1=CC=CN1"),
        ("c1ccccc1", "C1=CC=CC=C1"),
    ]
    for a, b in pairs:
        assert compute_descriptors(a) == compute_descriptors(b)


# -------------------------------------------------------- canonicalization
CANON_GROUPS = [
    ["c1ccccc1", "C1=CC=CC=C1"],
    ["CCO", "OCC"],
    ["CC(=O)Oc1ccccc1C(=O)O", "OC(=O)c1ccccc1OC(C)=O", "O=C(O)c1ccccc1OC(=O)C"],
    ["Cn1cnc2c1c(=O)n(C)c(=O)n2C", "CN1C=NC2=C1C(=O)N(C)C(=O)N2C"],
    ["c1ccncc1", "n1ccccc1", "C1=CC=NC=C1"],
    ["c1cc[nH]c1", "C1=CC=CN1"],
    ["[Na+].[Cl-]", "[Cl-].[Na+]"],
    ["c1ccc2ccccc2c1", "C1=CC=C2C=CC=CC2=C1"],
    ["CCN(CC)CC", "N(CC)(CC)CC"],
]


@pytest.mark.parametrize("group", CANON_GROUPS, ids=[g[0] for g in CANON_GROUPS])
def test_canonical_invariance(group):
    forms = {canonical_smiles(s) for s in group}
    assert len(forms) == 1, forms


@pytest.mark.parametrize(
    "smi",
    [
        "CC(=O)Oc1ccccc1C(=O)O",
        "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
        "O=c1cc[nH]c(=O)[nH]1",
        "CN1CCC[C@H]1c1cccnc1",
        "c1ccc2ccccc2c1",
        "c1cc(ccc1N)S(=O)(=O)N",
    ],
)
def test_canonical_roundtrip_fixpoint(smi):
    """canonical(x) re-parses to the same formula and is a fixpoint."""
    c = canonical_smiles(smi)
    assert c is not None
    assert mol_formula_weight(parse_smiles(c)) == pytest.approx(
        mol_formula_weight(parse_smiles(smi)), abs=1e-6
    )
    assert canonical_smiles(c) == c


def test_canonical_invalid():
    assert canonical_smiles("((((") is None


# ------------------------------------------------------------ fingerprints
def _tanimoto(a: str, b: str) -> float:
    sa = {i for i, c in enumerate(a) if c == "1"}
    sb = {i for i, c in enumerate(b) if c == "1"}
    return len(sa & sb) / len(sa | sb)


def test_ecfp_written_form_invariance():
    assert morgan_bits("CCO") == morgan_bits("OCC")
    assert morgan_bits("c1ccccc1") == morgan_bits("C1=CC=CC=C1")


def test_ecfp_tanimoto_ordering():
    """Structurally similar pairs score far above dissimilar ones."""
    aspirin = morgan_bits("CC(=O)Oc1ccccc1C(=O)O")
    methyl_aspirin = morgan_bits("CC(=O)Oc1ccccc1C(=O)OC")
    caffeine = morgan_bits("Cn1cnc2c1c(=O)n(C)c(=O)n2C")
    close = _tanimoto(aspirin, methyl_aspirin)
    far = _tanimoto(aspirin, caffeine)
    assert close > 0.5 > far


def test_ecfp_counts_consistency():
    counts = morgan_counts("Cn1cnc2c1c(=O)n(C)c(=O)n2C", n_bits=2048)
    bits = morgan_bits("Cn1cnc2c1c(=O)n(C)c(=O)n2C", n_bits=2048)
    assert counts is not None
    on = {i for i, c in enumerate(bits) if c == "1"}
    assert set(counts) == on
    assert all(v >= 1 for v in counts.values())


def test_ecfp_invalid():
    assert morgan_bits("((((") is None
    assert morgan_counts("") is None


# ------------------------------------------------------ topology block
def test_chi_indices_hand_computed():
    """Randić/Kier-Hall connectivity on ethanol — closed-form values."""
    import math

    from workbench_spark.chem.topology import chi_indices

    d = chi_indices(parse_smiles("CCO"))
    assert d["chi0"] == pytest.approx(1 + 1 / math.sqrt(2) + 1, abs=1e-6)
    assert d["chi1"] == pytest.approx(2 / math.sqrt(2), abs=1e-6)
    assert d["chi0v"] == pytest.approx(1 + 1 / math.sqrt(2) + 1 / math.sqrt(5), abs=1e-6)
    assert d["chi1v"] == pytest.approx(1 / math.sqrt(2) + 1 / math.sqrt(10), abs=1e-6)
    # benzene: six degree-2 atoms
    d = chi_indices(parse_smiles("c1ccccc1"))
    assert d["chi0"] == pytest.approx(6 / math.sqrt(2), abs=1e-6)


def test_kappa_indices_hand_computed():
    from workbench_spark.chem.topology import kappa_indices

    # propane: A=3, P1=2 → κ1=3·4/4=3; P2=1 → κ2=2·1/1=2
    k = kappa_indices(parse_smiles("CCC"))
    assert k["kappa1"] == pytest.approx(3.0) and k["kappa2"] == pytest.approx(2.0)
    # cyclohexane: A=6, P1=6 → κ1 = 6·25/36
    k = kappa_indices(parse_smiles("C1CCCCC1"))
    assert k["kappa1"] == pytest.approx(6 * 25 / 36, abs=1e-5)


def test_carbon_types_and_acid_base():
    from workbench_spark.chem.topology import topology_descriptors

    d = topology_descriptors(parse_smiles("CC(C)C"))  # isobutane
    assert d["c1sp3"] == 3 and d["c3sp3"] == 1
    d = topology_descriptors(parse_smiles("NCC(=O)O"))  # glycine
    assert d["n_carboxylic_acid"] == 1 and d["n_amine_primary"] == 1
    d = topology_descriptors(parse_smiles("CC(=O)N"))  # acetamide
    assert d["n_amine_primary"] == 0  # amide N excluded
    d = topology_descriptors(parse_smiles("CC(=O)Nc1ccc(O)cc1"))  # paracetamol
    assert d["n_phenol"] == 1 and d["n_amine_secondary"] == 0
    assert d["n_aromatic_bonds"] == 6 and d["n_ring_atoms"] == 6


# ------------------------------------------------------------- toxicity
def test_toxicity_flags():
    from workbench_spark.chem.toxicity import (
        contains_heavy_metals,
        halogen_toxicity_score,
        toxic_elements,
        toxic_groups,
        toxicity_flags,
    )

    # clean drug: no flags
    d = toxicity_flags(parse_smiles("CC(=O)Oc1ccccc1C(=O)O"))
    assert not d["is_toxic"] and d["toxic_elements"] is None

    # chloroform: trichloromethyl alert + halogens over threshold
    m = parse_smiles("C(Cl)(Cl)Cl")
    assert "trichloromethyl" in toxic_groups(m)
    c, t = halogen_toxicity_score(m)
    assert c == 3 and t == 2 and "Cl" in toxic_elements(m)

    # mercury salt: heavy metal + always-toxic element
    m = parse_smiles("C[Hg]C")
    assert contains_heavy_metals(m) and toxic_elements(m) == ["Hg"]

    # choline (benign quaternary N+): exempt from N+ flag but the
    # quaternary_ammonium group alert still fires (reference behavior)
    m = parse_smiles("C[N+](C)(C)CCO")
    assert toxic_elements(m) is None
    assert "quaternary_ammonium" in toxic_groups(m)

    # pyridinium N+ (not a benign quat): flagged
    m = parse_smiles("CC(=O)[n+]1ccccc1")
    assert "N+" in (toxic_elements(m) or [])

    # dithiocarbamate + thiourea
    assert "dithiocarbamate" in toxic_groups(parse_smiles("CNC(=S)NC"))
    assert "thiourea" in toxic_groups(parse_smiles("NC(=S)N"))

    # phosphate ester
    assert "phosphate_ester" in toxic_groups(parse_smiles("COP(=O)(OC)OC"))

    # trichlorinated aromatic ring
    assert "trichloro_aromatic" in toxic_groups(
        parse_smiles("c1c(Cl)c(Cl)c(Cl)cc1")
    )

    # halogenated carbonyl (chloroacetone)
    assert "halogenated_carbonyl" in toxic_groups(parse_smiles("CC(=O)CCl"))


def test_toxicity_fg_hierarchy_alerts():
    """The RDKit functional-group-hierarchy alerts the reference also
    scans (toxicity.py:131-137) plus Cr(VI)/phosphonium/arsenic-oxide
    customs and the catechol exemption (r3 ADVICE parity items)."""
    from workbench_spark.chem.toxicity import toxic_groups

    assert "nitro" in toxic_groups(parse_smiles("[O-][N+](=O)c1ccccc1"))
    assert "nitro" in toxic_groups(parse_smiles("CC(N(=O)=O)C"))  # uncharged form
    assert "azide" in toxic_groups(parse_smiles("CN=[N+]=[N-]"))
    assert "alcohol" in toxic_groups(parse_smiles("CCO"))
    # phenol is NOT an FG-hierarchy Alcohol (aromatic carbon)
    assert toxic_groups(parse_smiles("Oc1ccccc1")) is None
    # carboxylic acid OH is not an alcohol (carbonyl exclusion)
    assert "alcohol" not in (toxic_groups(parse_smiles("CC(=O)O")) or [])
    assert "aldehyde" in toxic_groups(parse_smiles("CC=O"))
    # formaldehyde/ketone are not aldehydes under [CX3H1](=O)[#6]
    assert "aldehyde" not in (toxic_groups(parse_smiles("CC(=O)C")) or [])
    assert "terminal_alkyne" in toxic_groups(parse_smiles("C#CC"))
    assert "terminal_alkyne" not in (toxic_groups(parse_smiles("CC#CC")) or [])
    assert "halogen" in toxic_groups(parse_smiles("CCCl"))
    assert "chromium_vi" in toxic_groups(parse_smiles("O=[Cr](=O)=O"))
    assert "phosphonium" in toxic_groups(parse_smiles("CC[P+](CC)(CC)CC"))
    assert "arsenic_oxide" in toxic_groups(parse_smiles("O[As](=O)=O"))
    # catechol exemption voids ALL group alerts (reference returns None)
    assert toxic_groups(parse_smiles("Oc1ccccc1O")) is None
    assert toxic_groups(parse_smiles("Oc1ccc(CCl)cc1O")) is None
    # but a lone phenol does not exempt
    assert "halogen" in toxic_groups(parse_smiles("Oc1ccc(CCl)cc1"))


def test_bridgehead_spiro_descriptors():
    from workbench_spark.chem.descriptors import bridgehead_spiro

    def bs(s):
        d = bridgehead_spiro(parse_smiles(s))
        return d["numbridgeheadatoms"], d["numspiroatoms"]

    assert bs("C1CC2CCC1C2") == (2, 0)          # norbornane
    assert bs("C1CC2CCC1CC2") == (2, 0)         # bicyclo[2.2.2]octane
    assert bs("C1CCC2(CC1)CCCCC2") == (0, 1)    # spiro[5.5]undecane
    assert bs("c1ccc2ccccc2c1") == (0, 0)       # fused: neither
    assert bs("c1ccccc1") == (0, 0)
    assert bs("CCO") == (0, 0)


# --------------------------------------------- property: canonicalization
def _random_molecule_smiles(rng, permute: bool):
    """Emit a SMILES for a random connected graph via a naive DFS writer
    (independent of canon.py's emitter). ``permute`` relabels the atoms,
    producing a differently-written string for the same molecule."""
    n = rng.randint(3, 10)
    elements = [rng.choice("CCCCNOS") for _ in range(n)]
    # random spanning tree + up to 2 extra ring edges
    edges = {}
    for i in range(1, n):
        j = rng.randrange(i)
        edges[(j, i)] = rng.choice([1, 1, 1, 2])
    extra = 0
    for _ in range(10):
        if extra >= 2:
            break
        a, b = rng.randrange(n), rng.randrange(n)
        if a == b:
            continue
        key = (min(a, b), max(a, b))
        if key in edges:
            continue
        edges[key] = 1
        extra += 1

    order = list(range(n))
    if permute:
        rng.shuffle(order)
    pos = {atom: k for k, atom in enumerate(order)}
    # rebuild adjacency under the permuted labels
    adj = {k: [] for k in range(n)}
    for (a, b), o in edges.items():
        adj[pos[a]].append((pos[b], o))
        adj[pos[b]].append((pos[a], o))
    syms = [None] * n
    for atom, k in pos.items():
        syms[k] = elements[atom]

    visited = set()
    ring_digits = {}
    next_digit = [1]
    tree = set()
    # pre-walk to find tree/back edges from node 0
    stack = [(0, None)]
    seen = {0}
    while stack:
        x, parent = stack.pop()
        for nb, o in sorted(adj[x]):
            key = frozenset((x, nb))
            if nb in seen:
                if key not in tree and key not in ring_digits:
                    ring_digits[key] = next_digit[0]
                    next_digit[0] += 1
            else:
                seen.add(nb)
                tree.add(key)
                stack.append((nb, x))

    def emit(x, parent):
        visited.add(x)
        out = syms[x]
        for nb, o in sorted(adj[x]):
            key = frozenset((x, nb))
            if key in ring_digits:
                out += ("=" if o == 2 else "") + str(ring_digits[key])
        children = [
            (nb, o)
            for nb, o in sorted(adj[x])
            if frozenset((x, nb)) in tree and nb != parent and nb not in visited
        ]
        for k, (nb, o) in enumerate(children):
            body = ("=" if o == 2 else "") + emit(nb, x)
            out += f"({body})" if k < len(children) - 1 else body
        return out

    return emit(0, None)


def test_canonical_invariance_random_graphs():
    """Property: the canonical form is invariant under atom relabeling,
    for 120 random connected multi-ring graphs."""
    import random as _random

    for seed in range(120):
        rng = _random.Random(seed)
        s1 = _random_molecule_smiles(rng, permute=False)
        rng2 = _random.Random(seed)
        # consume the identical graph draws, then permute labels
        _ = _random_molecule_smiles(rng2, permute=False)
        s2 = _random_molecule_smiles(_PermutedReplay(seed), permute=True)
        c1, c2 = canonical_smiles(s1), canonical_smiles(s2)
        assert c1 is not None
        assert c1 == c2, f"seed {seed}: {s1!r} vs {s2!r} -> {c1!r} != {c2!r}"
        assert canonical_smiles(c1) == c1  # fixpoint


class _PermutedReplay:
    """random.Random clone that replays the same graph draws as the given
    seed, but answers the shuffle() call differently (so only the atom
    labeling changes, not the graph)."""

    def __init__(self, seed):
        import random as _random

        self._base = _random.Random(seed)
        self._alt = _random.Random(seed + 10_000)

    def randint(self, a, b):
        return self._base.randint(a, b)

    def choice(self, seq):
        return self._base.choice(seq)

    def randrange(self, n):
        return self._base.randrange(n)

    def shuffle(self, x):
        self._alt.shuffle(x)


def test_distance_indices_hand_computed():
    """Wiener/Zagreb/Balaban on published closed-form examples."""
    from workbench_spark.chem.topology import distance_indices

    d = distance_indices(parse_smiles("CCCC"))  # butane
    assert d["wiener"] == 10 and d["zagreb1"] == 10 and d["zagreb2"] == 8
    assert d["balaban_j"] == pytest.approx(1.974745, abs=1e-4)  # published
    assert distance_indices(parse_smiles("C1CCCCC1"))["wiener"] == 27
    assert distance_indices(parse_smiles("CC(C)CC"))["wiener"] == 18


def test_ring_family_and_nhoh_counts():
    from workbench_spark.chem.descriptors import h_bond_atom_counts, ring_family

    d = ring_family(parse_smiles("CN1CCC[C@H]1c1cccnc1"))  # nicotine
    assert d == dict(numaromaticheterocycles=1, numsaturatedrings=1,
                     numaliphaticrings=1, numheterocycles=2, largestringsize=6)
    d = ring_family(parse_smiles("Cn1cnc2c1c(=O)n(C)c(=O)n2C"))  # caffeine
    assert d["numaromaticheterocycles"] == 1  # imidazole; 6-ring demoted
    assert d["numaliphaticrings"] == 1 and d["numsaturatedrings"] == 0
    assert h_bond_atom_counts(parse_smiles("CC(=O)Oc1ccccc1C(=O)O")) == {
        "nhohcount": 1, "nocount": 4,
    }
    assert h_bond_atom_counts(parse_smiles("CC(=O)Nc1ccc(O)cc1")) == {
        "nhohcount": 2, "nocount": 3,
    }
