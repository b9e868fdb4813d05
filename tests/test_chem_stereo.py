"""Canonical-key stereo tests (round-3 verdict item #3): enantiomers get
distinct keys; relabeled writings of the SAME enantiomer collapse; the
canonical form round-trips through parse→canonicalize idempotently.

Hand-derived frames for the alanine panel (chirality neighbor order as
the SMILES spec reads it: preceding atom, bracket H, then remaining
neighbors in written order):

  A  N[C@@H](C)C(=O)O    frame [N,  H, Me, Ac] @@
  B  C[C@H](N)C(=O)O     frame [Me, H, N,  Ac] @   (N<->Me swap: odd,
                                                    symbol flipped -> A)
  D  OC(=O)[C@@H](N)C    frame [Ac, H, N,  Me] @@  (3-cycle N->Ac->Me:
                                                    even, same symbol -> A)
  E  N[C@H](C)C(=O)O     frame [N,  H, Me, Ac] @   (enantiomer of A)
"""

import pytest

from workbench_spark.chem.canon import canonical_smiles

ALA_A = "N[C@@H](C)C(=O)O"
ALA_B = "C[C@H](N)C(=O)O"
ALA_D = "OC(=O)[C@@H](N)C"
ALA_E = "N[C@H](C)C(=O)O"

SAME = [
    (ALA_A, ALA_B),
    (ALA_A, ALA_D),
    # bromochlorofluoromethane: [F,H,Cl,Br]@ vs [F,H,Cl,Br] written with
    # F leading: frame [F,H,Cl,Br] -- identical frame, same symbol
    ("[C@H](F)(Cl)Br", "F[C@@H](Cl)Br"),
    # ring stereocenter written entering the ring from either side:
    # [Cl,H,ring-C,O...] vs [Cl,H,ring-O,C...]: single swap, flipped sym
    ("Cl[C@@H]1CCCCO1", "Cl[C@H]1OCCCC1"),
]

ENANTIOMERS = [
    (ALA_A, ALA_E),
    ("F[C@@H](Cl)Br", "F[C@H](Cl)Br"),
    ("Cl[C@@H]1CCCCO1", "Cl[C@H]1CCCCO1"),
]


@pytest.mark.parametrize("a,b", SAME)
def test_same_molecule_collapses(a, b):
    ca, cb = canonical_smiles(a), canonical_smiles(b)
    assert ca is not None and ca == cb, (a, b, ca, cb)


@pytest.mark.parametrize("a,b", ENANTIOMERS)
def test_enantiomers_distinct(a, b):
    ca, cb = canonical_smiles(a), canonical_smiles(b)
    assert ca is not None and cb is not None
    assert ca != cb, f"enantiomers merged: {a} vs {b} -> {ca}"


@pytest.mark.parametrize(
    "smi",
    [s for pair in ENANTIOMERS for s in pair] + ["CC(C)O", "c1ccccc1"],
)
def test_canonical_idempotent(smi):
    c1 = canonical_smiles(smi)
    c2 = canonical_smiles(c1)
    assert c1 == c2, f"not a fixpoint: {smi} -> {c1} -> {c2}"


def test_achiral_unaffected():
    assert "@" not in canonical_smiles("CC(N)C(=O)O")
    # chirality on a center with 2 implicit H is not a stereocenter:
    # the mark is dropped rather than emitted in a bogus frame
    c = canonical_smiles("[C@H2](F)C")
    assert c is not None and "@" not in c


def test_stereo_survives_salt_components():
    c = canonical_smiles("N[C@@H](C)C(=O)O.[Na+]")
    assert c is not None and "@" in c


def test_constitution_key_unchanged_for_achiral_forms():
    """The pre-existing invariance gate still holds: three achiral
    writings of aspirin collapse to one key."""
    forms = [
        "CC(=O)Oc1ccccc1C(=O)O",
        "OC(=O)c1ccccc1OC(C)=O",
        "O=C(O)C1=CC=CC=C1OC(C)=O",
    ]
    keys = {canonical_smiles(f) for f in forms}
    assert len(keys) == 1
