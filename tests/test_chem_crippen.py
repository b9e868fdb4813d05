"""Golden tests for the vendored Wildman-Crippen logP/MR table.

Anchor set: molecules whose hand atom-type decomposition under the 1999
paper's table reproduces the widely-published RDKit ``MolLogP``/``MolMR``
outputs exactly (4 decimals). Each anchor cross-checks every atom type it
touches; collectively they pin C1,C2,C3,C5,C8,C10,C11,C18,C19,C21,C22,
C23, H1-H4, O2,O9,O10, N3,N11. Types outside this set are transcribed
from the paper but unanchored (LOWCONF in ``chem/crippen.py``) — no test
here asserts a "published" value we could not verify.
"""

import pytest

from workbench_spark.chem.crippen import atom_type, crippen_logp_mr
from workbench_spark.chem.smiles import parse_smiles

# smiles -> (logp, mr_or_None). MR anchors only where arithmetic-verified.
GOLDEN = {
    "c1ccccc1": (1.6866, 26.4420),          # benzene: 6xC18 + 6xH1
    "Cc1ccccc1": (1.9950, None),            # toluene: +C8,C21
    "CCO": (-0.0014, 12.7598),              # ethanol: C1,C3,O2,H1,H2
    "Oc1ccccc1": (1.3922, None),            # phenol: C23,O2,H2
    "CC(=O)O": (0.0909, None),              # acetic acid: C5,O9,H4
    "OC(=O)c1ccccc1": (1.3848, None),       # benzoic acid: O10
    "Nc1ccccc1": (1.2688, None),            # aniline: C22,N3,H3
    "c1ccc2ccccc2c1": (2.8398, None),       # naphthalene: C19 bridgeheads
    "c1ccncc1": (1.0816, None),             # pyridine: N11
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O": (3.0732, None),  # ibuprofen: C2,C10,C11
    "Oc1ccccc1C(=O)O": (1.0904, None),      # salicylic acid
}


@pytest.mark.parametrize("smiles,expected", sorted(GOLDEN.items()))
def test_golden_logp_mr(smiles, expected):
    logp, mr = crippen_logp_mr(parse_smiles(smiles))
    assert logp == pytest.approx(expected[0], abs=1e-4), smiles
    if expected[1] is not None:
        assert mr == pytest.approx(expected[1], abs=1e-4), smiles


# Atom-typing spot checks: (smiles, atom index, expected type)
TYPES = [
    ("CC(C)C", 1, "C2"),            # isobutane CH
    ("CCO", 1, "C3"),               # CH2 next to O
    ("CC(=O)C", 1, "C5"),           # ketone carbon
    ("C=C", 0, "C6"),               # ethylene
    ("C#C", 0, "C7"),               # acetylene
    ("Cc1ccccc1", 0, "C8"),         # aryl methyl
    ("CCc1ccccc1", 1, "C10"),       # benzylic CH2
    ("Fc1ccccc1", 1, "C14"),        # c-F
    ("Clc1ccccc1", 1, "C15"),       # c-Cl
    ("c1ccc(-c2ccccc2)cc1", 3, "C20"),  # biphenyl link
    ("C=Cc1ccccc1", 1, "C26"),      # styrene CH=
    ("CN", 1, "N1"),                # methylamine
    ("CNC", 1, "N2"),               # dimethylamine
    ("CN(C)C", 1, "N7"),            # trimethylamine
    ("C#N", 1, "N9"),               # nitrile N
    ("CC=N", 2, "N5"),              # imine NH
    ("c1cc[nH]c1", 3, "N11"),       # pyrrole N
    ("COC", 1, "O3"),               # dimethyl ether
    ("COc1ccccc1", 1, "O4"),        # anisole ether O
    ("O=[N+]([O-])c1ccccc1", 0, "O5"),  # nitro =O
    ("O=[N+]([O-])c1ccccc1", 2, "O5"),  # nitro O-
    ("CS", 1, "S1"),                # methanethiol
    ("c1ccsc1", 3, "S3"),           # thiophene S
    ("CC(=O)[O-]", 3, "O12"),       # acetate carboxylate O
]


@pytest.mark.parametrize("smiles,idx,expected", TYPES)
def test_atom_typing(smiles, idx, expected):
    mol = parse_smiles(smiles)
    assert atom_type(mol, mol.atoms[idx]) == expected, smiles


def test_every_atom_gets_a_contribution():
    """No molecule in the fallback classes crashes; CS/NS/OS cover the
    long tail like the paper prescribes."""
    for smi in ["C[Si](C)(C)C", "O=S(=O)(O)O", "CP(C)C", "[Na+].[Cl-]",
                "O", "[NH4+]", "C1CC1", "c1ccoc1"]:
        logp, mr = crippen_logp_mr(parse_smiles(smi))
        assert isinstance(logp, float) and isinstance(mr, float), smi


def test_logp_hydrophobicity_ordering():
    """Sanity: longer alkyl chains are more lipophilic; polar groups
    reduce logP — the qualitative behavior the model was fit for."""
    def lp(s):
        return crippen_logp_mr(parse_smiles(s))[0]

    assert lp("CCCCCC") > lp("CCCC") > lp("CC")
    assert lp("CCO") < lp("CC")
    assert lp("c1ccccc1") > lp("Oc1ccccc1") > lp("Nc1ccccc1")
