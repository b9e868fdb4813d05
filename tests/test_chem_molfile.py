"""V2000 mol-block parsing + wedge-stereo perception (S14 structural
half; r3 VERDICT #8 — SDF stereo feeding stereo-aware canonical keys)."""

import pytest

from workbench_spark.chem.canon import canonical_smiles


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
from workbench_spark.chem.molfile import (
    MolfileError,
    molblock_to_smiles,
    parse_molblock,
)


def mk_mol(atoms, bonds, props=()):
    """atoms: [(x, y, z, symbol)]; bonds: [(a, b, order, wedge)] 1-based."""
    lines = ["", "  test", ""]
    lines.append(f"{len(atoms):3d}{len(bonds):3d}  0  0  0  0  0  0  0  0999 V2000")
    for x, y, z, s in atoms:
        lines.append(
            f"{x:10.4f}{y:10.4f}{z:10.4f} {s:<3s} 0  0  0  0  0  0  0  0  0  0  0  0"
        )
    for a, b, o, w in bonds:
        lines.append(f"{a:3d}{b:3d}{o:3d}{w:3d}")
    lines.extend(props)
    lines.append("M  END")
    return "\n".join(lines)


ALANINE_ATOMS = [
    (-0.866, 0.5, 0, "N"), (0, 0, 0, "C"), (0.866, 0.5, 0, "C"),
    (0, -1, 0, "C"), (0.866, -1.5, 0, "O"), (-0.866, -1.5, 0, "O"),
]
ALANINE_BONDS_FLAT = [(2, 1, 1, 0), (2, 3, 1, 0), (2, 4, 1, 0), (4, 5, 2, 0), (4, 6, 1, 0)]


def test_parse_basic_graph():
    mol = parse_molblock(mk_mol(ALANINE_ATOMS, ALANINE_BONDS_FLAT))
    assert len(mol.atoms) == 6 and len(mol.bonds) == 5
    assert [a.symbol for a in mol.atoms] == ["N", "C", "C", "C", "O", "O"]
    # implicit H by valence: N=2, CH=1, CH3=3, acid C=0, =O 0, OH 1
    assert [a.h_count for a in mol.atoms] == [2, 1, 3, 0, 0, 1]


def test_wedge_up_down_distinct_and_match_smiles_enantiomers():
    up = molblock_to_smiles(mk_mol(ALANINE_ATOMS, [(2, 1, 1, 1)] + ALANINE_BONDS_FLAT[1:]))
    down = molblock_to_smiles(mk_mol(ALANINE_ATOMS, [(2, 1, 1, 6)] + ALANINE_BONDS_FLAT[1:]))
    flat = molblock_to_smiles(mk_mol(ALANINE_ATOMS, ALANINE_BONDS_FLAT))
    assert up != down
    # the two wedge directions map one-to-one onto the two SMILES-parsed
    # enantiomers — same canonical keyspace as SMILES input
    assert {up, down} == {
        canonical_smiles("N[C@H](C)C(=O)O"),
        canonical_smiles("N[C@@H](C)C(=O)O"),
    }
    assert flat == canonical_smiles("NC(C)C(=O)O")


def test_wedge_parity_atom_order_invariant():
    up = molblock_to_smiles(mk_mol(ALANINE_ATOMS, [(2, 1, 1, 1)] + ALANINE_BONDS_FLAT[1:]))
    # permute atom file order (N C C C O O -> C C N C O O mapping below)
    atoms_p = [ALANINE_ATOMS[i] for i in (3, 1, 0, 2, 4, 5)]
    bonds_p = [(2, 3, 1, 1), (2, 4, 1, 0), (2, 1, 1, 0), (1, 5, 2, 0), (1, 6, 1, 0)]
    assert molblock_to_smiles(mk_mol(atoms_p, bonds_p)) == up


def test_explicit_hydrogen_folded_and_used_for_stereo():
    # same alanine but H written as an explicit atom with a down-wedge
    # (complementary to N-up: same enantiomer as wedging N up)
    atoms = ALANINE_ATOMS + [(0, 1, 0, "H")]
    bonds = ALANINE_BONDS_FLAT + [(2, 7, 1, 6)]
    got = molblock_to_smiles(mk_mol(atoms, bonds))
    mol = parse_molblock(mk_mol(atoms, bonds))
    assert len(mol.atoms) == 6  # H folded into the stereocenter
    assert mol.atoms[1].h_count == 1
    assert got in {
        canonical_smiles("N[C@H](C)C(=O)O"),
        canonical_smiles("N[C@@H](C)C(=O)O"),
    }


def test_3d_coordinates_set_parity():
    # tetrahedral center with true 3D coordinates; wedge flag designates
    # the stereocenter, geometry supplies the volume sign
    atoms = [
        (0, 0, 0, "C"),
        (0, 0, 1, "F"),
        (0.943, 0, -0.333, "Cl"),
        (-0.471, 0.816, -0.333, "Br"),
        (-0.471, -0.816, -0.333, "I"),
    ]
    bonds = [(1, 2, 1, 1), (1, 3, 1, 0), (1, 4, 1, 0), (1, 5, 1, 0)]
    got = molblock_to_smiles(mk_mol(atoms, bonds))
    # looking from F: Cl(0deg) -> Br(120deg) -> I(240deg) anticlockwise = @
    assert got == canonical_smiles("[C@](F)(Cl)(Br)I"), got
    # mirrored z -> the other enantiomer
    atoms_m = [(x, y, -z, s) for x, y, z, s in atoms]
    got_m = molblock_to_smiles(mk_mol(atoms_m, bonds))
    assert got_m == canonical_smiles("[C@@](F)(Cl)(Br)I"), got_m


def test_charge_codes_and_property_lines():
    # old-style charge column: code 3 = +1, code 5 = -1
    block = mk_mol([(0, 0, 0, "N"), (1, 0, 0, "O")], [(1, 2, 1, 0)])
    block = block.replace(
        "    0.0000    0.0000    0.0000 N   0",
        "    0.0000    0.0000    0.0000 N   3",  # this column is mass-diff...
    )
    # charge actually lives at columns 36-39; use M  CHG which supersedes
    block = mk_mol(
        [(0, 0, 0, "N"), (1, 0, 0, "O")],
        [(1, 2, 1, 0)],
        props=["M  CHG  2   1   1   2  -1"],
    )
    mol = parse_molblock(block)
    assert mol.atoms[0].charge == 1 and mol.atoms[1].charge == -1


def test_isotope_property_line():
    block = mk_mol([(0, 0, 0, "C")], [], props=["M  ISO  1   1  13"])
    mol = parse_molblock(block)
    assert mol.atoms[0].isotope == 13


def test_aromatic_bond_type_4():
    # benzene drawn with aromatic (type 4) bonds
    import math

    atoms = [
        (math.cos(i * math.pi / 3), math.sin(i * math.pi / 3), 0, "C")
        for i in range(6)
    ]
    bonds = [(i + 1, (i + 1) % 6 + 1, 4, 0) for i in range(6)]
    assert molblock_to_smiles(mk_mol(atoms, bonds)) == canonical_smiles("c1ccccc1")


def test_kekule_ring_perceived_aromatic():
    import math

    atoms = [
        (math.cos(i * math.pi / 3), math.sin(i * math.pi / 3), 0, "C")
        for i in range(6)
    ]
    bonds = [(i + 1, (i + 1) % 6 + 1, 1 + i % 2, 0) for i in range(6)]
    assert molblock_to_smiles(mk_mol(atoms, bonds)) == canonical_smiles("c1ccccc1")


def test_salt_components():
    block = mk_mol(
        [(0, 0, 0, "Na"), (2, 0, 0, "Cl"), (4, 0, 0, "C"), (5, 0, 0, "O")],
        [(3, 4, 1, 0)],
        props=["M  CHG  2   1   1   2  -1"],
    )
    mol = parse_molblock(block)
    assert mol.n_components == 3


def test_malformed_blocks_raise():
    with pytest.raises(MolfileError):
        parse_molblock("too\nshort")
    with pytest.raises(MolfileError):
        parse_molblock("\n\n\nnot a counts line\n")
    assert molblock_to_smiles("garbage") is None


def test_spark_sdf_to_canonical_smiles(spark):
    from workbench_spark.operators.chem import sdf_to_canonical_smiles

    up = mk_mol(ALANINE_ATOMS, [(2, 1, 1, 1)] + ALANINE_BONDS_FLAT[1:])
    down = mk_mol(ALANINE_ATOMS, [(2, 1, 1, 6)] + ALANINE_BONDS_FLAT[1:])
    df = spark.createDataFrame(
        [("a", up), ("b", down), ("c", None), ("d", "garbage")],
        "id string, mol_block string",
    )
    out = {r["id"]: r["canonical_smiles"] for r in sdf_to_canonical_smiles(df).collect()}
    assert out["a"] is not None and out["b"] is not None
    assert out["a"] != out["b"]  # enantiomers -> distinct dedup keys
    assert out["c"] is None and out["d"] is None


def test_partial_explicit_h_still_fills_valence():
    """V2000: explicit Hs count toward valence and the REMAINDER fills
    implicitly — C drawn with one explicit H is methane, not [CH]."""
    mol = parse_molblock(mk_mol([(0, 0, 0, "C"), (1, 0, 0, "H")], [(1, 2, 1, 0)]))
    assert [(a.symbol, a.h_count) for a in mol.atoms] == [("C", 4)]
    mol = parse_molblock(mk_mol([(0, 0, 0, "N"), (1, 0, 0, "H")], [(1, 2, 1, 0)]))
    assert [(a.symbol, a.h_count) for a in mol.atoms] == [("N", 3)]
    # fully explicit ethanol keeps the right counts
    atoms = [(0, 0, 0, "C"), (1, 0, 0, "C"), (2, 0, 0, "O")] + [
        (3 + i, 0, 0, "H") for i in range(6)
    ]
    bonds = [(1, 2, 1, 0), (2, 3, 1, 0), (1, 4, 1, 0), (1, 5, 1, 0),
             (1, 6, 1, 0), (2, 7, 1, 0), (2, 8, 1, 0), (3, 9, 1, 0)]
    mol = parse_molblock(mk_mol(atoms, bonds))
    assert [(a.symbol, a.h_count) for a in mol.atoms] == [
        ("C", 3), ("C", 2), ("O", 1)
    ]


def test_isotopic_and_charged_h_not_folded():
    """Deuterium/tritium/charged hydrogens stay real atoms (RDKit removeHs
    behavior) — folding them would merge D/T with protio dedup keys."""
    mol = parse_molblock(
        mk_mol([(0, 0, 0, "C"), (1, 0, 0, "H")], [(1, 2, 1, 0)],
               props=["M  ISO  1   2   2"])
    )
    kinds = sorted((a.symbol, a.h_count, a.isotope) for a in mol.atoms)
    assert ("H", 0, 2) in kinds          # deuterium kept
    assert ("C", 3, None) in kinds       # carbon fills remaining valence
    # H-H bond (molecular hydrogen) keeps its bond
    mol = parse_molblock(mk_mol([(0, 0, 0, "H"), (1, 0, 0, "H")], [(1, 2, 1, 0)]))
    assert len(mol.atoms) == 2 and len(mol.bonds) == 1


def test_terminal_alkyne_not_nitrile():
    from workbench_spark.chem.smiles import parse_smiles
    from workbench_spark.chem.toxicity import toxic_groups

    assert "terminal_alkyne" not in (toxic_groups(parse_smiles("C#N")) or [])
    assert "terminal_alkyne" in (toxic_groups(parse_smiles("C#C")) or [])


def test_extended_null_for_unparameterized_elements():
    """CLAUDE.md invariant: uncomputable weightings go NULL, never 0."""
    from workbench_spark.chem.extended import (
        autocorrelation_mass,
        bcut_descriptors,
    )
    from workbench_spark.chem.smiles import parse_smiles

    # uranium: outside both the mass table and the Crippen typing ->
    # every BCUT weighting and the mass autocorrelation go NULL
    m = parse_smiles("[U]")
    d = bcut_descriptors(m)
    assert all(v is None for v in d.values())
    a = autocorrelation_mass(m)
    assert all(v is None for v in a.values())
    # selenium IS covered (mass table + Crippen Me2 fallback): real values
    m2 = parse_smiles("C[Se]C")
    d2 = bcut_descriptors(m2)
    assert d2["bcut_mw_hi"] is not None and d2["bcut_logp_hi"] is not None
