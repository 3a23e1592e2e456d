"""Synthetic random-complex factory for model and sampler tests."""
import numpy as np

from diffdock_pocket_tpu import graph as graphlib


def make_raw_complex(seed=0, n_lig=12, n_res=8, atoms_per_res=5, n_tor=3, n_sc=4):
    """A geometrically plausible random complex (ligand chain + receptor)."""
    rng = np.random.default_rng(seed)

    # ligand: a random chain, bonds (i, i+1), torsion bonds rotate the tail
    lig_pos = np.cumsum(rng.normal(0, 1.0, (n_lig, 3)), axis=0).astype(np.float32)
    lig_pos -= lig_pos.mean(0)
    lig_feat = rng.integers(0, 2, (n_lig, 16)).astype(np.int32)
    bonds = []
    for i in range(n_lig - 1):
        bonds.append((i, i + 1))
        bonds.append((i + 1, i))
    lig_bond_index = np.asarray(bonds, dtype=np.int32)
    bond_types = rng.integers(0, 4, len(bonds))
    lig_bond_attr = np.eye(4, dtype=np.float32)[bond_types]

    tor = []
    tor_masks = []
    for k in range(n_tor):
        i = 2 + 2 * k
        if i + 2 >= n_lig:
            break
        tor.append((i, i + 1))
        m = np.zeros(n_lig, dtype=bool)
        m[i + 1 :] = True
        tor_masks.append(m)
    tor_bond_index = np.asarray(tor, dtype=np.int32).reshape(-1, 2)
    tor_rotate_mask = (
        np.asarray(tor_masks) if tor_masks else np.zeros((0, n_lig), dtype=bool)
    )

    # receptor: residues on a loose shell around the ligand
    dirs = rng.normal(0, 1, (n_res, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rec_pos = (dirs * rng.uniform(6, 12, (n_res, 1))).astype(np.float32)
    rec_feat = rng.integers(0, 20, (n_res, 1)).astype(np.int32)

    # residue kNN lists (host-precomputed in the real pipeline)
    d = np.linalg.norm(rec_pos[:, None] - rec_pos[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    k = min(4, n_res - 1)
    nbr = np.argsort(d, axis=1)[:, :k].astype(np.int32)
    nbr_mask = np.ones_like(nbr, dtype=bool)

    # atoms: cluster around each residue
    atom_pos, atom_res = [], []
    for r in range(n_res):
        for _ in range(atoms_per_res):
            atom_pos.append(rec_pos[r] + rng.normal(0, 1.0, 3))
            atom_res.append(r)
    atom_pos = np.asarray(atom_pos, dtype=np.float32)
    atom_res = np.asarray(atom_res, dtype=np.int32)
    atom_feat = rng.integers(0, 4, (len(atom_pos), 4)).astype(np.int32)

    # flexible side chains: bonds within residue atom clusters; the rotated
    # subcomponent is the rest of the residue's atoms
    sc_bonds, sc_masks, sc_res = [], [], []
    for k2 in range(n_sc):
        r = k2 % n_res
        base = r * atoms_per_res
        u, v = base + 1, base + 2
        m = np.zeros(len(atom_pos), dtype=bool)
        m[base + 3 : base + atoms_per_res] = True
        sc_bonds.append((u, v))
        sc_masks.append(m)
        sc_res.append(k2)
    sc_bond_index = np.asarray(sc_bonds, dtype=np.int32).reshape(-1, 2)
    sc_rotate_mask = (
        np.asarray(sc_masks) if sc_masks else np.zeros((0, len(atom_pos)), dtype=bool)
    )

    return {
        "lig_pos": lig_pos,
        "lig_orig_pos": lig_pos.copy(),
        "lig_feat": lig_feat,
        "lig_bond_index": lig_bond_index,
        "lig_bond_attr": lig_bond_attr,
        "tor_bond_index": tor_bond_index,
        "tor_rotate_mask": tor_rotate_mask,
        "rec_pos": rec_pos,
        "rec_feat": rec_feat,
        "rec_esm": np.zeros((n_res, 0), dtype=np.float32),
        "rec_nbr_idx": nbr,
        "rec_nbr_mask": nbr_mask,
        "atom_pos": atom_pos,
        "atom_orig_pos": atom_pos.copy(),
        "atom_feat": atom_feat,
        "atom_res_index": atom_res,
        "sc_bond_index": sc_bond_index,
        "sc_rotate_mask": sc_rotate_mask,
        "sc_res_index": np.asarray(sc_res, dtype=np.int32),
        "original_center": np.zeros(3, dtype=np.float32),
    }


SMALL_BUCKETS = {
    "lig": (16,),
    "rec": (12,),
    "atom": (48,),
    "tor": (4,),
    "sc": (6,),
    "bond": (32,),
}


def make_graph(seed=0, **kw):
    raw = make_raw_complex(seed=seed, **kw)
    return graphlib.from_raw(raw, buckets=SMALL_BUCKETS)
