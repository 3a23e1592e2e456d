"""Ligand conformer generation + torsional conformer matching.

Parity targets (reference):
- generate_conformer (RDKit ETKDG)         datasets/process_mols.py:456-464
- optimize_rotatable_bonds (torsional
  differential evolution vs the crystal)   datasets/conformer_matching.py:16-82

This environment has no RDKit, so conformer generation is implemented as a
documented three-tier strategy:
1. if RDKit happens to be importable, use ETKDG (exact reference behaviour);
2. otherwise ``jittered_torsion_conformer``: every rotatable-bond torsion
   re-drawn uniformly at random (pose fully decorrelated), local geometry
   jittered within tight chemistry bounds seeded from the input's own
   torsion-invariant distances, then refined against the full smoothed
   bounds matrix (which also relaxes self-clashes the random torsions
   introduce).  This is the quality-matched stand-in for ETKDG: the
   in-env idealized chemistry tables are NOT ETKDG-grade (measured 11 deg
   mean / 36 deg max angle error on 3dpf), and round 4 traced a silent
   training-quality collapse to pure-chemistry embeds — matched
   conformers plateaued at 2.1-2.6 A, so held-out docking bottomed out
   at 2.3-2.9 A (vs 0.3-0.9 A before).  Torsion-invariant distances
   cannot carry the pose: everything a rotatable bond can change keeps
   its generic bounds.
3. ``dg_embed_conformer``: the pure-chemistry first-party DG embedding
   (bounds matrix -> triangle smoothing -> NERF tree-build with random
   free dihedrals -> bound-violation refinement with a signed-volume
   chirality hinge) — local structure rebuilt from idealized chemistry
   with NOTHING of the input geometry.  Kept as an explicit capability
   (e.g. conformer generation without any 3D input) but no longer the
   training default, for the quality reason above.
4. ``randomize_torsions``: tier 2 without the jitter/refinement.
The subsequent differential-evolution matching then recovers torsions
against the crystal exactly like the reference; conformer_match_ligand
additionally enforces MATCH_RMSD_GATE with a tier-4 fallback so a bad
generated conformer can never silently cap training quality again.

The matching objective is RMSD after optimal rigid alignment (Kabsch), which
is what AllChem.AlignMol minimizes.
"""
from __future__ import annotations

import logging
from typing import Optional

import numpy as np
from scipy.optimize import differential_evolution

from .mol import Molecule

logger = logging.getLogger(__name__)

# matched-RMSD ceiling above which a generated conformer is rejected in
# favor of tier 3 (see conformer_match_ligand) — generous vs the ~0.1-0.5 A
# healthy range so genuine ETKDG-style variation is never discarded
MATCH_RMSD_GATE = 1.2


def _apply_torsions_np(pos, bond_index, rotate_mask, updates):
    """Sequential bond rotations (numpy mirror of diffusion.apply_torsion_updates)."""
    from scipy.spatial.transform import Rotation as R

    pos = pos.copy()
    for i, (u, v) in enumerate(bond_index):
        if updates[i] == 0:
            continue
        axis = pos[u] - pos[v]
        n = np.linalg.norm(axis)
        if n < 1e-9:
            continue
        rot = R.from_rotvec(axis * updates[i] / n).as_matrix()
        sel = rotate_mask[i]
        pos[sel] = (pos[sel] - pos[v]) @ rot.T + pos[v]
    return pos


def aligned_rmsd(a: np.ndarray, b: np.ndarray) -> float:
    """RMSD after optimal rigid alignment of a onto b."""
    ac = a - a.mean(0)
    bc = b - b.mean(0)
    h = ac.T @ bc
    u, s, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    return float(np.sqrt(np.mean(np.sum((ac @ r.T - bc) ** 2, axis=1))))


def randomize_torsions(mol: Molecule, rng: np.random.Generator) -> Molecule:
    bond_index, rotate_mask = mol.rotatable_bonds()
    if len(bond_index) == 0:
        return mol
    updates = rng.uniform(-np.pi, np.pi, len(bond_index))
    return mol.with_coords(
        _apply_torsions_np(mol.coords, bond_index, rotate_mask, updates)
    )


def _rigid_components(mol: Molecule) -> np.ndarray:
    """Component id per atom after cutting every rotatable bond: atoms in
    one component keep fixed relative geometry under torsional matching
    (rings, conjugated/planar units, terminal groups)."""
    bond_index, _ = mol.rotatable_bonds()
    rot = {(int(u), int(v)) for u, v in bond_index}
    rot |= {(v, u) for u, v in rot}
    comp = np.full(mol.n_atoms, -1, np.int32)
    nbr = mol.neighbors()
    cid = 0
    for s in range(mol.n_atoms):
        if comp[s] >= 0:
            continue
        stack = [s]
        comp[s] = cid
        while stack:
            u = stack.pop()
            for v in nbr[u]:
                if comp[v] < 0 and (u, v) not in rot:
                    comp[v] = cid
                    stack.append(v)
        cid += 1
    return comp


def _distance_bounds(mol: Molecule, seed_local_geometry: bool = False):
    """Distance-geometry bounds matrices (lower, upper) [N, N].

    1-2 from covalent radii (scaled by bond order), 1-3 from the law of
    cosines at the center's ideal hybridization angle, 1-4 between the cis
    and trans extremes, everything else between vdW contact and the
    through-bond path length; smoothed to triangle consistency
    (Floyd-Warshall on U; L lifted via L_ij >= L_ik - U_kj).

    With ``seed_local_geometry`` (default), distances a torsional match can
    NEVER change — intra-rigid-component pairs and the 1-2/1-3 pairs across
    each rotatable bond — are tightened around the input conformer's own
    values (the module-docstring deviation: the idealized tables here are
    not ETKDG-grade, and a loose rigid-unit geometry puts a hard floor
    under the downstream conformer-matching RMSD).  All pose-carrying
    distances (any pair separated by a rotatable bond beyond its 1-3
    shell) keep their generic chemistry bounds."""
    from . import chem

    n = mol.n_atoms
    hyb = mol.hybridizations()
    rings_all = [set(r) for r in mol.ring_info()[0]]
    ring_sizes = [len(r) for r in mol.ring_info()[0]]
    # aromatic-LIKE atoms for geometry only (never the is_aromatic feature,
    # which is a trained-embedding contract): explicit type-4 bonds OR
    # membership in a 5-7 ring whose atoms are all sp/sp2 — Kekule-drawn
    # SDFs encode benzene as alternating single/double with no type-4 bond
    aro = list(mol.aromatic_flags())
    for r, sz in zip(rings_all, ring_sizes):
        if 5 <= sz <= 7 and all(hyb[i] in ("SP", "SP2") for i in r):
            for i in r:
                aro[i] = True
    blen = {}
    for b in mol.bonds:
        order = b.type
        # a "single" ring bond between aromatic-like atoms is really
        # ~1.40 A; a conjugated single between sp2 centers (biaryl,
        # diene) ~1.46 A
        if order == 1 and aro[b.a] and aro[b.b] and any(
            b.a in r and b.b in r for r in rings_all
        ):
            order = 4
        d = chem.ideal_bond_length(mol.symbols[b.a], mol.symbols[b.b], order)
        if order == 1 and hyb[b.a] in ("SP", "SP2") and hyb[b.b] in ("SP", "SP2"):
            d -= 0.06
        blen[(b.a, b.b)] = blen[(b.b, b.a)] = d

    big = 1e3
    U = np.full((n, n), big)
    L = np.zeros((n, n))
    np.fill_diagonal(U, 0.0)
    for (i, j), d in blen.items():
        L[i, j] = d - 0.03
        U[i, j] = d + 0.03

    ang = {"SP": np.pi, "SP2": 2 * np.pi / 3, "SP3": np.deg2rad(109.47)}
    nbr = mol.neighbors()

    def ring_angle(i, j, k):
        """Interior angle at j when i-j-k all lie in one ring: the regular
        R-gon angle of the smallest shared ring (5-rings bend well below
        the sp2 120-degree prediction; heteroatom deviations ride the
        widened tolerance)."""
        shared = [sz for r, sz in zip(rings_all, ring_sizes)
                  if i in r and j in r and k in r]
        if not shared:
            return None
        R = min(shared)
        return (R - 2) * np.pi / R

    for j in range(n):
        theta_hyb = ang.get(hyb[j], np.deg2rad(109.47))
        for ai in range(len(nbr[j])):
            for bi in range(ai + 1, len(nbr[j])):
                i, k = nbr[j][ai], nbr[j][bi]
                ra = ring_angle(i, j, k)
                theta, tol = (ra, 0.22) if ra is not None else (theta_hyb, 0.15)
                d1, d2 = blen[(i, j)], blen[(j, k)]
                d13 = np.sqrt(d1 * d1 + d2 * d2 - 2 * d1 * d2 * np.cos(theta))
                # tolerances validated against the 3dpf crystal staying
                # inside the smoothed bounds
                L[i, k] = L[k, i] = max(L[i, k], d13 - tol)
                U[i, k] = U[k, i] = min(U[i, k], d13 + tol)

    # 1-4: cis (eclipsed) to trans extremes through the central bond
    for b in mol.bonds:
        j, k = b.a, b.b
        for i in nbr[j]:
            for l in nbr[k]:
                if len({i, j, k, l}) < 4:
                    continue
                dij, djk, dkl = blen[(i, j)], blen[(j, k)], blen[(k, l)]
                th1 = ang.get(hyb[j], np.deg2rad(109.47))
                th2 = ang.get(hyb[k], np.deg2rad(109.47))
                # planar cis / trans distances for the i-j-k-l chain:
                # j at origin, k on +x; j->i makes angle th1 with j->k
                # (x-component cos(th1) < 0 for tetrahedral), k->l makes
                # angle th2 with k->j (x-component -cos(th2) > 0); phi is
                # the i-j-k-l dihedral (0 = cis, pi = trans)
                def chain_d(phi):
                    pj = np.zeros(3)
                    pk = np.asarray([djk, 0.0, 0.0])
                    pi = pj + dij * np.asarray(
                        [np.cos(th1), np.sin(th1), 0.0])
                    pl = pk + dkl * np.asarray(
                        [-np.cos(th2),
                         np.sin(th2) * np.cos(phi),
                         np.sin(th2) * np.sin(phi)])
                    return float(np.linalg.norm(pi - pl))
                d_cis, d_trans = chain_d(0.0), chain_d(np.pi)
                lo, hi = min(d_cis, d_trans), max(d_cis, d_trans)
                L[i, l] = L[l, i] = max(L[i, l], lo - 0.35)
                U[i, l] = U[l, i] = min(U[i, l], hi + 0.35)

    # default lower bound for unconstrained pairs: vdW contact, softened by
    # graph proximity — pairs in the same ring system or 4 bonds apart sit
    # well below 0.8x the vdW sum in real molecules (fused rings,
    # gauche 1-5), and an unsatisfiable lower bound frustrates the whole
    # refinement (validated: the 3dpf crystal sits inside these bounds)
    import collections as _c

    hops = np.full((n, n), n + 10, np.int32)
    for s in range(n):
        hops[s, s] = 0
        dq = _c.deque([s])
        while dq:
            u = dq.popleft()
            for v in nbr[u]:
                if hops[s, v] > hops[s, u] + 1:
                    hops[s, v] = hops[s, u] + 1
                    dq.append(v)
    rings_sets = [set(r) for r in mol.ring_info()[0]]
    ring_id = [set() for _ in range(n)]
    for ri, r in enumerate(rings_sets):
        for i in r:
            ring_id[i].add(ri)
    for i in range(n):
        for j in range(i + 1, n):
            if L[i, j] == 0.0:
                vd = (chem.vdw_radius(mol.symbols[i])
                      + chem.vdw_radius(mol.symbols[j]))
                if ring_id[i] & ring_id[j]:
                    lo = 1.8
                elif hops[i, j] == 4:
                    lo = min(0.65 * vd, 2.4)
                else:
                    lo = 0.8 * vd
                L[i, j] = L[j, i] = lo

    # torsion-invariant pairs from the input's own geometry (see docstring):
    # (a) every 1-2 and 1-3 pair — rotating about any bond preserves both;
    # (b) every intra-rigid-component pair — no rotatable bond separates
    # them, so torsional matching can never adjust their distance.
    if seed_local_geometry:
        comp = _rigid_components(mol)
        D = np.linalg.norm(
            mol.coords[:, None, :].astype(np.float64)
            - mol.coords[None, :, :].astype(np.float64), axis=-1)
        for i in range(n):
            for j in range(i + 1, n):
                if hops[i, j] <= 2 or comp[i] == comp[j]:
                    tol = 0.02 if hops[i, j] <= 2 else 0.04
                    L[i, j] = L[j, i] = D[i, j] - tol
                    U[i, j] = U[j, i] = D[i, j] + tol

    # triangle smoothing
    for k in range(n):
        U = np.minimum(U, U[:, k : k + 1] + U[k : k + 1, :])
    for k in range(n):
        L = np.maximum(L, L[:, k : k + 1] - U[k : k + 1, :])
    L = np.minimum(L, U)  # keep consistent where vdW exceeded path bounds
    return L, U


def _refine(pos, L, U, w_strong, iters=300, lr=0.05, chiral=(), weak_w=1.0):
    """Gradient descent on squared bound violations (w_strong marks pairs
    with tight chemistry bounds: bonds/angles get 10x weight; weak_w=0 is
    the final local-geometry polish — only chemistry bounds + chirality
    active, so vdW/long-range terms cannot hold bonds stretched).

    ``chiral``: per tetrahedral stereocenter (pts [4 atom indices], s = +-1
    desired sign of det[p1-p0, p2-p0, p3-p0]) — a hinge max(0, m - s*V)
    pushes the signed volume to the wanted parity (ring-locked centers
    cannot be fixed by re-rolling dihedrals or global mirroring)."""
    n = len(pos)
    iu, ju = np.triu_indices(n, 1)
    w = np.where(w_strong[iu, ju], 10.0, weak_w)
    lo, hi = L[iu, ju], U[iu, ju]
    w_chiral, margin = 3.0, 0.5
    for _ in range(iters):
        diff = pos[iu] - pos[ju]
        d = np.linalg.norm(diff, axis=1) + 1e-9
        over = np.maximum(0.0, d - hi)
        under = np.maximum(0.0, lo - d)
        coef = w * (over - under) / d  # d(loss)/d(d) / d
        g = np.zeros_like(pos)
        gi = coef[:, None] * diff
        np.add.at(g, iu, gi)
        np.add.at(g, ju, -gi)
        for pts, s in chiral:
            p0, p1, p2, p3 = pos[pts[0]], pos[pts[1]], pos[pts[2]], pos[pts[3]]
            a, b, c = p1 - p0, p2 - p0, p3 - p0
            V = float(np.dot(a, np.cross(b, c)))
            if s * V >= margin:
                continue
            dV1 = np.cross(b, c)
            dV2 = np.cross(c, a)
            dV3 = np.cross(a, b)
            g[pts[1]] -= w_chiral * s * dV1
            g[pts[2]] -= w_chiral * s * dV2
            g[pts[3]] -= w_chiral * s * dV3
            g[pts[0]] += w_chiral * s * (dV1 + dV2 + dV3)
        # clip per-atom displacement: large early violations otherwise
        # produce divergent steps (the loss is quadratic, the step is not
        # line-searched)
        step = lr * g
        norm = np.linalg.norm(step, axis=1, keepdims=True)
        step = step * np.minimum(1.0, 0.15 / (norm + 1e-12))
        pos = pos - step
    return pos


def _tree_build(mol: Molecule, rng: np.random.Generator) -> np.ndarray:
    """Initial coordinates by NERF chain extension over a DFS spanning tree:
    ideal bond lengths (covalent radii x bond order), ideal angles at the
    parent's hybridization, dihedral 0/pi inside rings (planar start; DFS
    walks a ring as one arm so the closure lands near its bond bound) and
    random for free bonds.  Ring closures + sibling geometry are left to
    the bound refinement."""
    import collections

    from . import chem

    n = mol.n_atoms
    hyb = mol.hybridizations()
    ang = {"SP": np.pi, "SP2": 2 * np.pi / 3, "SP3": np.deg2rad(109.47)}
    blen = {}
    for b in mol.bonds:
        d = chem.ideal_bond_length(mol.symbols[b.a], mol.symbols[b.b], b.type)
        blen[(b.a, b.b)] = blen[(b.b, b.a)] = d
    rings, _ = mol.ring_info()
    rings = [set(r) for r in rings]
    ring_edges = {
        e for b in mol.bonds if any(b.a in r and b.b in r for r in rings)
        for e in ((b.a, b.b), (b.b, b.a))
    }
    nbr = mol.neighbors()

    parent = {0: None}
    order, stack = [], [0]
    while stack:  # DFS: a ring is walked as one arm
        u = stack.pop()
        order.append(u)
        for v in reversed(nbr[u]):
            if v not in parent:
                parent[v] = u
                stack.append(v)

    def normalize(v):
        return v / (np.linalg.norm(v) + 1e-12)

    pos = np.zeros((n, 3))
    child_count = collections.Counter()
    # distinct tetrahedral directions for the root's children (they have no
    # grandparent frame; identical directions would start whole sibling
    # subtrees coincident and the refinement would have to untangle fully
    # overlapped arms from a near-zero-gradient state)
    root_dirs = np.asarray([
        [1.0, 0.0, 0.0],
        [-1.0 / 3.0, 2.0 * np.sqrt(2.0) / 3.0, 0.0],
        [-1.0 / 3.0, -np.sqrt(2.0) / 3.0, np.sqrt(6.0) / 3.0],
        [-1.0 / 3.0, -np.sqrt(2.0) / 3.0, -np.sqrt(6.0) / 3.0],
    ])
    for c in order:
        p = parent[c]
        if p is None:
            continue
        g = parent[p]
        d = blen[(c, p)]
        if g is None:
            k = child_count[p]
            child_count[p] += 1
            pos[c] = pos[p] + d * root_dirs[k % 4]
            continue
        h = parent[g]
        theta = ang.get(hyb[p], np.deg2rad(109.47))
        k = child_count[p]
        child_count[p] += 1
        if (c, p) in ring_edges:
            phi = 0.0 if k == 0 else np.pi
        else:
            phi = rng.uniform(-np.pi, np.pi) + k * 2 * np.pi / 3
        ref = pos[h] if h is not None else pos[g] + np.asarray([0.3, 1.0, 0.0])
        bc = normalize(pos[p] - pos[g])
        nrm = np.cross(pos[g] - ref, bc)
        if np.linalg.norm(nrm) < 1e-6:
            nrm = np.cross(bc, np.asarray([0.0, 0.0, 1.0]))
        nrm = normalize(nrm)
        m = np.stack([bc, np.cross(nrm, bc), nrm], axis=1)
        local = np.asarray([
            d * np.cos(np.pi - theta),
            d * np.sin(np.pi - theta) * np.cos(phi),
            d * np.sin(np.pi - theta) * np.sin(phi),
        ])
        pos[c] = pos[p] + m @ local
    return pos


def jittered_torsion_conformer(
    mol: Molecule, rng: np.random.Generator
) -> Molecule:
    """Tier 2 (training default): randomized torsions + chemistry-bounded
    local-geometry jitter + clash refinement (module docstring).  The
    refinement target includes the generic vdW lower bounds, so
    self-clashes introduced by the random torsion draw get relaxed — a
    quality improvement over plain randomize_torsions."""
    L, U = _distance_bounds(mol, seed_local_geometry=True)
    w_strong = U - L < 0.5
    pos = randomize_torsions(mol, rng).coords.astype(np.float64)
    pos = pos + rng.normal(0, 0.01, pos.shape)
    pos = _refine(pos, L, U, w_strong, iters=200)
    return mol.with_coords(pos.astype(np.float32))


def dg_embed_conformer(
    mol: Molecule, rng: np.random.Generator, n_tries: int = 4,
    seed_local_geometry: bool = False,
) -> Optional[Molecule]:
    """First-party distance-geometry conformer embedding (the ETKDG role,
    reference process_mols.py:456-464 via RDKit EmbedMolecule): NERF
    tree-build from idealized chemistry (random free dihedrals), refine
    against smoothed distance bounds (ring closures, sibling angles, vdW
    clashes), then restore tetrahedral chirality by mirroring if the
    embedded parities disagree with the input's.  Like ETKDG, local
    structure is rebuilt from chemistry; unlike ETKDG the in-env tables
    leave a ~2 A matched-RMSD floor (measured), which is why this is an
    explicit capability rather than the training default — see the module
    docstring, tier 3.

    Returns None when no try passes the local-geometry quality gate (max
    bond-length error < 0.1 A) — callers fall back to torsion
    randomization."""
    n = mol.n_atoms
    if n < 4 or not mol.bonds:
        return None
    L, U = _distance_bounds(mol, seed_local_geometry=seed_local_geometry)
    w_strong = U - L < 0.5  # bonds/angles (tight chemistry bounds)
    want_tags = mol.chiral_tags()
    tagged = [i for i, t in enumerate(want_tags) if t != "CHI_UNSPECIFIED"]
    # signed-volume specs matching chiral_tags' conventions: 4 heavy
    # neighbors -> det over neighbors in bond order; 3 heavy + implicit H
    # -> det of neighbors relative to the center; CW = negative sign
    nbr = mol.neighbors()
    chiral_spec = []
    for i in tagged:
        s = -1.0 if want_tags[i] == "CHI_TETRAHEDRAL_CW" else 1.0
        heavy = nbr[i]
        pts = tuple(heavy) if len(heavy) == 4 else (i, *heavy)
        chiral_spec.append((pts, s))

    def mismatches(cand):
        got = cand.chiral_tags()
        return sum(1 for i in tagged if got[i] != "CHI_UNSPECIFIED"
                   and got[i] != want_tags[i])

    best = None
    best_score = (np.inf, np.inf)  # (chirality mismatches, bond error)
    for _ in range(n_tries):
        pos = _tree_build(mol, rng)
        pos = pos + rng.normal(0, 0.02, pos.shape)  # break exact planarity
        pos = _refine(pos.astype(np.float64), L, U, w_strong, iters=800)

        cand = mol.with_coords(pos.astype(np.float32))
        # if most tagged centers mirror-flipped, reflect the whole conformer
        if tagged and mismatches(cand) > len(tagged) / 2:
            pos = pos * np.asarray([-1.0, 1.0, 1.0])
        # finish with the chirality hinge active (ring-locked centers),
        # then polish local geometry with only chemistry bounds active
        pos = _refine(pos, L, U, w_strong, iters=600, chiral=chiral_spec)
        pos = _refine(pos, L, U, w_strong, iters=300, chiral=chiral_spec,
                      weak_w=0.0)
        cand = mol.with_coords(pos.astype(np.float32))

        err = max(
            abs(float(np.linalg.norm(pos[b.a] - pos[b.b]))
                - (L[b.a, b.b] + U[b.a, b.b]) / 2)
            for b in mol.bonds
        )
        # prefer chirality-correct candidates; re-rolled dihedrals re-roll
        # the embedded parities, so extra tries fix partial mismatches
        score = (mismatches(cand) if tagged else 0, err)
        if err < 0.1 and score < best_score:
            best, best_score = cand, score
        if best is not None and best_score[0] == 0:
            break
    # a flipped stereocenter is unrecoverable downstream (torsional DE
    # matching and rigid+torsion diffusion cannot un-mirror a center), so a
    # chirality-mismatched embed must NOT be used: fall back to tier 3
    # (torsion randomization preserves the input's chirality exactly)
    if best is not None and best_score[0] > 0:
        logger.info("dg_embed: %d stereocenter(s) flipped after %d tries; "
                    "falling back to torsion randomization", best_score[0],
                    n_tries)
        return None
    return best


def generate_conformer(mol: Molecule, rng: Optional[np.random.Generator] = None) -> Molecule:
    """An independent conformer of ``mol`` (see module docstring strategy)."""
    try:  # tier 1: real ETKDG when RDKit exists
        from rdkit import Chem
        from rdkit.Chem import AllChem

        rd = Chem.RWMol()
        for s in mol.symbols:
            rd.AddAtom(Chem.Atom(s))
        order = {1: Chem.BondType.SINGLE, 2: Chem.BondType.DOUBLE,
                 3: Chem.BondType.TRIPLE, 4: Chem.BondType.AROMATIC}
        for b in mol.bonds:
            rd.AddBond(b.a, b.b, order.get(b.type, Chem.BondType.SINGLE))
        m = rd.GetMol()
        Chem.SanitizeMol(m)
        AllChem.EmbedMolecule(m, AllChem.ETKDGv2())
        conf = m.GetConformer()
        coords = np.asarray(
            [[conf.GetAtomPosition(i).x, conf.GetAtomPosition(i).y, conf.GetAtomPosition(i).z]
             for i in range(m.GetNumAtoms())],
            np.float32,
        )
        return mol.with_coords(coords)
    except Exception:
        rng = rng or np.random.default_rng(0)
        # tier 2: randomized torsions + bounded local jitter + de-clash
        # (NOT the pure-chemistry DG embed — see module docstring tier 3
        # for why that one is no longer the training default)
        return jittered_torsion_conformer(mol, rng)


def optimize_rotatable_bonds(
    conformer: Molecule,
    target: Molecule,
    popsize: int = 15,
    maxiter: int = 15,
    seed: int = 0,
) -> tuple[Molecule, float]:
    """Differential evolution over the conformer's rotatable-bond torsions to
    minimize aligned RMSD against ``target``.  Returns (matched conformer,
    final aligned RMSD)."""
    bond_index, rotate_mask = conformer.rotatable_bonds()
    if len(bond_index) == 0:
        return conformer, aligned_rmsd(conformer.coords, target.coords)

    base = conformer.coords

    def objective(x):
        pos = _apply_torsions_np(base, bond_index, rotate_mask, x)
        return aligned_rmsd(pos, target.coords)

    bounds = [(-np.pi, np.pi)] * len(bond_index)
    res = differential_evolution(
        objective, bounds, popsize=popsize, maxiter=maxiter, seed=seed, tol=0.01,
    )
    matched = conformer.with_coords(
        _apply_torsions_np(base, bond_index, rotate_mask, res.x)
    )
    return matched, float(res.fun)


def conformer_match_ligand(
    lig: Molecule,
    popsize: int = 15,
    maxiter: int = 15,
    rng: Optional[np.random.Generator] = None,
) -> tuple[Molecule, float]:
    """Training-input ligand: independent conformer with torsions matched to
    the crystal (reference get_lig_graph_with_matching semantics,
    process_mols.py:467-512).  The matched conformer is finally rigid-aligned
    onto the crystal frame.

    Quality gate: a matched RMSD above MATCH_RMSD_GATE means the generated
    conformer's rigid geometry is unusable (torsion matching cannot repair
    it) and the whole training example would inherit that error as a hard
    docking floor — round 4 measured exactly this (2.1-2.6 A matched
    conformers => held-out best RMSD 2.3-2.9 A, vs 0.1-0.35 A / 0.3-0.9 A
    before the regression).  On gate failure fall back to tier 3
    (torsion-randomized input geometry) and rematch."""
    rng = rng or np.random.default_rng(0)
    gen = generate_conformer(lig, rng)
    matched, score = optimize_rotatable_bonds(gen, lig, popsize, maxiter)
    if score > MATCH_RMSD_GATE:
        logger.warning(
            "conformer matching landed at %.2f A (> %.1f gate); falling back "
            "to torsion-randomized input geometry", score, MATCH_RMSD_GATE)
        gen = randomize_torsions(lig, rng)
        matched, score = optimize_rotatable_bonds(gen, lig, popsize, maxiter)
    # place in the crystal frame (AlignMol side effect in the reference)
    a = matched.coords - matched.coords.mean(0)
    b = lig.coords - lig.coords.mean(0)
    h = a.T @ b
    u, s, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    placed = a @ r.T + lig.coords.mean(0)
    return matched.with_coords(placed.astype(np.float32)), score
