"""MQN (Molecular Quantum Numbers, Nguyen/Reymond 2009) tests — golden
hand-counted molecules, Kekulé assignment edge cases, and structural
invariants every 42-count vector must satisfy."""

from __future__ import annotations

import pytest

from workbench_spark.chem.mqn import MQN_NAMES, kekulize_orders, mqn_descriptors
from workbench_spark.chem.smiles import parse_smiles


def mqn(smiles: str) -> dict:
    return mqn_descriptors(parse_smiles(smiles))


def test_mqn_names_are_42():
    assert len(MQN_NAMES) == 42
    assert len(set(MQN_NAMES)) == 42


def test_kekulize_benzene_and_pyridine():
    for smi in ("c1ccccc1", "c1ccncc1"):
        mol = parse_smiles(smi)
        orders = kekulize_orders(mol)
        assert sorted(orders) == [1, 1, 1, 2, 2, 2]
        # every aromatic carbon touches exactly one double bond
        dbl = [0] * len(mol.atoms)
        for b, o in zip(mol.bonds, orders):
            if o == 2:
                dbl[b.a] += 1
                dbl[b.b] += 1
        for a in mol.atoms:
            if a.symbol == "C":
                assert dbl[a.idx] == 1


def test_kekulize_pyrrole_lone_pair_nitrogen():
    mol = parse_smiles("c1cc[nH]c1")
    orders = kekulize_orders(mol)
    assert sorted(orders) == [1, 1, 1, 2, 2]
    # the N-H nitrogen contributes its lone pair: no double bond on it
    n_idx = next(a.idx for a in mol.atoms if a.symbol == "N")
    for b, o in zip(mol.bonds, orders):
        if o == 2:
            assert n_idx not in (b.a, b.b)


def test_kekulize_preserves_written_kekule():
    mol = parse_smiles("C1=CC=CC=C1")
    assert sorted(kekulize_orders(mol)) == [1, 1, 1, 2, 2, 2]


def test_mqn_glycine_polarity_block():
    d = mqn("NCC(=O)O")
    assert d["mqn_hbd"] == 2 and d["mqn_hbdm"] == 3
    assert d["mqn_hba"] == 3 and d["mqn_hbam"] == 5
    assert d["mqn_pos"] == 1 and d["mqn_neg"] == 1
    assert d["mqn_rbc"] == 1


def test_mqn_charged_atoms():
    d = mqn("[NH4+].[Cl-]")
    assert d["mqn_pos"] == 1
    assert d["mqn_cl"] == 1
    # ammonium N: 1 lone pair - 1 charge = 0 acceptor sites
    assert d["mqn_hbam"] == 0


def test_mqn_fused_ring_block():
    d = mqn("c1ccc2ccccc2c1")  # naphthalene
    assert d["mqn_r6"] == 2
    assert d["mqn_afr"] == 2 and d["mqn_bfr"] == 1
    assert d["mqn_csb"] == 6 and d["mqn_cdb"] == 5
    # spiro: rings share one atom, no shared bond
    d = mqn("C1CCC2(CC1)CCCC2")  # spiro[4.5]decane
    assert d["mqn_afr"] == 1 and d["mqn_bfr"] == 0
    assert d["mqn_cqv"] == 1


@pytest.mark.parametrize(
    "smi",
    ["CCO", "c1ccccc1", "NCC(=O)O", "C1COCCN1", "c1ccc2ccccc2c1",
     "CC(C)C#N", "O=S(=O)(O)c1ccccc1", "FC(F)(F)c1ccc(Cl)cc1"],
)
def test_mqn_structural_invariants(smi):
    mol = parse_smiles(smi)
    d = mqn_descriptors(mol)
    # atom buckets partition the heavy atoms
    others = len(mol.atoms) - sum(
        d[k] for k in ("mqn_c", "mqn_f", "mqn_cl", "mqn_br", "mqn_i",
                       "mqn_s", "mqn_p", "mqn_an", "mqn_cn", "mqn_ao", "mqn_co")
    )
    assert others >= 0 and d["mqn_hac"] == len(mol.atoms)
    # bond buckets partition the bonds (no quadruple bonds here)
    assert (
        d["mqn_asb"] + d["mqn_adb"] + d["mqn_atb"]
        + d["mqn_csb"] + d["mqn_cdb"] + d["mqn_ctb"]
    ) == len(mol.bonds)
    # valence buckets count every heavy atom exactly once
    assert (
        d["mqn_asv"] + d["mqn_adv"] + d["mqn_atv"] + d["mqn_aqv"]
        + d["mqn_cdv"] + d["mqn_ctv"] + d["mqn_cqv"]
    ) == len(mol.atoms)
    # donors are a subset of acceptors (N/O definitions), sites >= atoms
    assert d["mqn_hbd"] <= d["mqn_hba"]
    assert d["mqn_hbdm"] >= d["mqn_hbd"]
    # rings: SSSR count partitioned into the size buckets
    ring_total = sum(d[f"mqn_r{k}"] for k in range(3, 10)) + d["mqn_rg10"]
    assert ring_total == len(mol.rings)


def test_mqn_atom_relabel_invariance():
    # MQN is a bag of counts: any atom-order rewrite of the same molecule
    # must give the identical 42-vector
    a = mqn("CC(=O)Oc1ccccc1C(=O)O")   # aspirin
    b = mqn("OC(=O)c1ccccc1OC(C)=O")   # same molecule, rewritten
    assert a == b
