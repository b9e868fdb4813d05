"""Pure-Python chemistry engine: SMILES parsing, real 2D descriptors,
ECFP fingerprints, Morgan canonicalization. See smiles.py for scope."""
