"""Chemistry constants and categorical feature vocabularies.

Feature vocabularies mirror the reference tables
(datasets/process_mols.py:32-97 ``allowable_features`` and the derived
``lig_feature_dims`` / ``rec_atom_feature_dims`` / ``rec_residue_feature_dims``)
so embedding-table shapes and feature semantics are directly comparable.
These are standard cheminformatics enumerations (OGB-style ligand features,
PDB residue/atom-name vocabularies), written out here as this framework's own
vocabulary definition.

Also: element data (symbol <-> Z, vdW radii for steric-clash metrics,
covalent radii for bond perception in PDB/mol2 inputs without explicit
bonds) and standard amino-acid composition used by the host featurizer.
"""
from __future__ import annotations

# ---------------------------------------------------------------------------
# elements
# ---------------------------------------------------------------------------

ELEMENTS = [
    "H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne",
    "Na", "Mg", "Al", "Si", "P", "S", "Cl", "Ar", "K", "Ca",
    "Sc", "Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni", "Cu", "Zn",
    "Ga", "Ge", "As", "Se", "Br", "Kr", "Rb", "Sr", "Y", "Zr",
    "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd", "In", "Sn",
    "Sb", "Te", "I", "Xe", "Cs", "Ba", "La", "Ce", "Pr", "Nd",
    "Pm", "Sm", "Eu", "Gd", "Tb", "Dy", "Ho", "Er", "Tm", "Yb",
    "Lu", "Hf", "Ta", "W", "Re", "Os", "Ir", "Pt", "Au", "Hg",
    "Tl", "Pb", "Bi", "Po", "At", "Rn", "Fr", "Ra", "Ac", "Th",
    "Pa", "U",
]
SYMBOL_TO_Z = {s: i + 1 for i, s in enumerate(ELEMENTS)}
Z_TO_SYMBOL = {z: s for s, z in SYMBOL_TO_Z.items()}


def atomic_number(symbol: str) -> int:
    """Symbol -> Z; tolerant of PDB-style upper-case 2-letter symbols.
    Returns -1 for unknown."""
    if not symbol:
        return -1
    s = symbol.strip()
    if s in SYMBOL_TO_Z:
        return SYMBOL_TO_Z[s]
    s2 = s[0].upper() + s[1:].lower()
    return SYMBOL_TO_Z.get(s2, -1)


# van der Waals radii (Angstrom) — Bondi/UFF values for the elements that
# occur in protein-ligand complexes (reference: datasets/steric_clash.py:9-44)
VAN_DER_WAALS_RADII = {
    "H": 1.10, "C": 1.70, "N": 1.55, "O": 1.52, "F": 1.47,
    "P": 1.80, "S": 1.80, "Cl": 1.75, "Br": 1.85, "I": 1.98,
    "B": 1.92, "Si": 2.10, "Se": 1.90, "As": 1.85,
    "Na": 2.27, "K": 2.75, "Mg": 1.73, "Ca": 2.31, "Zn": 1.39,
    "Fe": 2.05, "Mn": 2.05, "Cu": 1.40, "Ni": 1.63, "Co": 2.00,
}
DEFAULT_VDW = 1.7

# single-bond covalent radii (Angstrom) for distance-based bond perception
COVALENT_RADII = {
    "H": 0.31, "C": 0.76, "N": 0.71, "O": 0.66, "F": 0.57,
    "P": 1.07, "S": 1.05, "Cl": 1.02, "Br": 1.20, "I": 1.39,
    "B": 0.84, "Si": 1.11, "Se": 1.20, "As": 1.19,
}
DEFAULT_COVALENT = 0.77

# typical maximum valences for implicit-H estimation (organic subset)
DEFAULT_VALENCE = {
    "H": 1, "B": 3, "C": 4, "N": 3, "O": 2, "F": 1,
    "Si": 4, "P": 3, "S": 2, "Cl": 1, "Br": 1, "I": 1, "Se": 2,
}

# ---------------------------------------------------------------------------
# categorical feature vocabularies (ligand)
# ---------------------------------------------------------------------------

ALLOWABLE_FEATURES = {
    "possible_atomic_num_list": list(range(1, 119)) + ["misc"],
    "possible_chirality_list": [
        "CHI_UNSPECIFIED", "CHI_TETRAHEDRAL_CW", "CHI_TETRAHEDRAL_CCW", "CHI_OTHER",
    ],
    "possible_degree_list": [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, "misc"],
    "possible_numring_list": [0, 1, 2, 3, 4, 5, 6, "misc"],
    "possible_implicit_valence_list": [0, 1, 2, 3, 4, 5, 6, "misc"],
    "possible_formal_charge_list": [-5, -4, -3, -2, -1, 0, 1, 2, 3, 4, 5, "misc"],
    "possible_numH_list": [0, 1, 2, 3, 4, 5, 6, 7, 8, "misc"],
    "possible_number_radical_e_list": [0, 1, 2, 3, 4, "misc"],
    "possible_hybridization_list": ["SP", "SP2", "SP3", "SP3D", "SP3D2", "misc"],
    "possible_is_aromatic_list": [False, True],
    "possible_is_in_ring3_list": [False, True],
    "possible_is_in_ring4_list": [False, True],
    "possible_is_in_ring5_list": [False, True],
    "possible_is_in_ring6_list": [False, True],
    "possible_is_in_ring7_list": [False, True],
    "possible_is_in_ring8_list": [False, True],
    "possible_amino_acids": [
        "ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS", "ILE",
        "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP", "TYR", "VAL",
        "HIP", "HIE", "TPO", "HID", "LEV", "MEU", "PTR", "GLV", "CYT", "SEP",
        "HIZ", "CYM", "GLM", "ASQ", "TYS", "CYX", "GLZ", "misc",
    ],
    "possible_atom_type_2": [
        "C*", "CA", "CB", "CD", "CE", "CG", "CH", "CZ", "N*", "ND", "NE", "NH",
        "NZ", "O*", "OD", "OE", "OG", "OH", "OX", "S*", "SD", "SG", "misc",
    ],
    "possible_atom_type_3": [
        "C", "CA", "CB", "CD", "CD1", "CD2", "CE", "CE1", "CE2", "CE3", "CG",
        "CG1", "CG2", "CH2", "CZ", "CZ2", "CZ3", "N", "ND1", "ND2", "NE",
        "NE1", "NE2", "NH1", "NH2", "NZ", "O", "OD1", "OD2", "OE1", "OE2",
        "OG", "OG1", "OH", "OXT", "SD", "SG", "misc",
    ],
}

# residues eligible for side-chain flexibility (reference:
# process_mols.py:66 'possible_flexible_sidechains'; ALA/GLY/PRO excluded at
# selection time)
FLEXIBLE_SIDECHAIN_RESIDUES = {
    "ARG", "HIS", "LYS", "ASP", "GLU", "SER", "THR", "ASN", "GLN", "CYS",
    "SEC", "GLY", "PRO", "ALA", "VAL", "ILE", "LEU", "MET", "PHE", "TYR", "TRP",
}

_LIG_FEATURE_KEYS = [
    "possible_atomic_num_list",
    "possible_chirality_list",
    "possible_degree_list",
    "possible_formal_charge_list",
    "possible_implicit_valence_list",
    "possible_numH_list",
    "possible_number_radical_e_list",
    "possible_hybridization_list",
    "possible_is_aromatic_list",
    "possible_numring_list",
    "possible_is_in_ring3_list",
    "possible_is_in_ring4_list",
    "possible_is_in_ring5_list",
    "possible_is_in_ring6_list",
    "possible_is_in_ring7_list",
    "possible_is_in_ring8_list",
]

LIG_FEATURE_DIMS = [len(ALLOWABLE_FEATURES[k]) for k in _LIG_FEATURE_KEYS]
REC_ATOM_FEATURE_DIMS = [
    len(ALLOWABLE_FEATURES["possible_amino_acids"]),
    len(ALLOWABLE_FEATURES["possible_atomic_num_list"]),
    len(ALLOWABLE_FEATURES["possible_atom_type_2"]),
    len(ALLOWABLE_FEATURES["possible_atom_type_3"]),
]
REC_RESIDUE_FEATURE_DIMS = [len(ALLOWABLE_FEATURES["possible_amino_acids"])]

BOND_TYPES = {"SINGLE": 0, "DOUBLE": 1, "TRIPLE": 2, "AROMATIC": 3}
NUM_BOND_TYPES = 4


def safe_index(lst, e):
    """Index of e in lst, or the last ('misc') slot if absent."""
    try:
        return lst.index(e)
    except ValueError:
        return len(lst) - 1


# canonical heavy-atom ordering per residue (reference: pdbbind.py SORTING_DICT,
# used to align apo/holo structures atom-by-atom)
RESIDUE_ATOM_ORDER = {
    "ALA": ["N", "CA", "C", "O", "CB"],
    "ARG": ["N", "CA", "C", "O", "CB", "CG", "CD", "NE", "CZ", "NH1", "NH2"],
    "ASN": ["N", "CA", "C", "O", "CB", "CG", "OD1", "ND2"],
    "ASP": ["N", "CA", "C", "O", "CB", "CG", "OD1", "OD2"],
    "CYS": ["N", "CA", "C", "O", "CB", "SG"],
    "GLN": ["N", "CA", "C", "O", "CB", "CG", "CD", "OE1", "NE2"],
    "GLU": ["N", "CA", "C", "O", "CB", "CG", "CD", "OE1", "OE2"],
    "GLY": ["N", "CA", "C", "O"],
    "HIS": ["N", "CA", "C", "O", "CB", "CG", "ND1", "CD2", "CE1", "NE2"],
    "ILE": ["N", "CA", "C", "O", "CB", "CG1", "CG2", "CD1"],
    "LEU": ["N", "CA", "C", "O", "CB", "CG", "CD1", "CD2"],
    "LYS": ["N", "CA", "C", "O", "CB", "CG", "CD", "CE", "NZ"],
    "MET": ["N", "CA", "C", "O", "CB", "CG", "SD", "CE"],
    "MSE": ["N", "CA", "C", "O", "CB", "CG", "SE", "CE"],
    "PHE": ["N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "CE1", "CE2", "CZ"],
    "PRO": ["N", "CA", "C", "O", "CB", "CG", "CD"],
    "SER": ["N", "CA", "C", "O", "CB", "OG"],
    "THR": ["N", "CA", "C", "O", "CB", "OG1", "CG2"],
    "TRP": ["N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "NE1", "CE2", "CE3", "CZ2", "CZ3", "CH2"],
    "TYR": ["N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "CE1", "CE2", "CZ", "OH"],
    "VAL": ["N", "CA", "C", "O", "CB", "CG1", "CG2"],
}

THREE_TO_ONE = {
    "ALA": "A", "ARG": "R", "ASN": "N", "ASP": "D", "CYS": "C",
    "GLN": "Q", "GLU": "E", "GLY": "G", "HIS": "H", "ILE": "I",
    "LEU": "L", "LYS": "K", "MET": "M", "PHE": "F", "PRO": "P",
    "SER": "S", "THR": "T", "TRP": "W", "TYR": "Y", "VAL": "V",
    "MSE": "M", "SEC": "U", "PYL": "O",
}


def vdw_radius(symbol: str) -> float:
    return VAN_DER_WAALS_RADII.get(symbol, DEFAULT_VDW)


def covalent_radius(symbol: str) -> float:
    return COVALENT_RADII.get(symbol, DEFAULT_COVALENT)


# bond-order shortening of the covalent-radius sum (Angstrom): double and
# triple bonds are shorter than the single-bond radii predict; 4 = aromatic
# (0.14: benzene C-C is 1.39 vs the 1.54 single-bond radius sum)
BOND_ORDER_SHRINK = {1: 0.0, 2: 0.12, 3: 0.22, 4: 0.14}


def ideal_bond_length(sym_a: str, sym_b: str, order: int = 1) -> float:
    """Idealized bond length used by the distance-geometry conformer
    embedder (bounds matrix AND tree-build start — single source so the
    two cannot drift apart)."""
    return (covalent_radius(sym_a) + covalent_radius(sym_b)
            - BOND_ORDER_SHRINK.get(order, 0.0))
