"""Offline constructor for the non-symmorphic space-group generator
table (``kikuchipy_tpu/crystallography/_sg_generated.py``).

The only authored inputs are the 230 canonical Hermann-Mauguin symbols
(``sg_symbols.HM_SYMBOLS``) and the point-group generator matrices
already used by the symmorphic table. For every group missing from the
curated tables, this tool SEARCHES generator translations on the
quarter/sixth grid whose closure reproduces the symbol exactly under
:func:`sg_symbols.verify_group` (multiplicity, point group, screw/glide
content with ITA printing rules, centrosymmetry). Origin conventions:

- centrosymmetric groups: the inversion generator is pinned at the
  origin (ITA origin choice 2);
- cubic groups: the body-diagonal 3-fold is pinned through the origin;
- polar / rotoinversion groups: the principal axis (or -4 point) is
  preferred through the origin;
- remaining freedom: candidates are ranked by how many symbol-named
  axes pass through the origin (ITA places origins on symmetry
  elements), then lexicographically. Groups where distinct operation
  SETS tie are flagged for manual review instead of silently chosen.

Run: ``python tools/gen_spacegroups.py`` (writes the data module).
"""

import itertools
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kikuchipy_tpu.crystallography import spacegroup as SG  # noqa: E402
from kikuchipy_tpu.crystallography.sg_symbols import (  # noqa: E402
    HM_SYMBOLS,
    PG_ORDER,
    point_group,
    verify_group,
)

OPS = SG._OPS

# Generator matrix names per missing group (the class's standard
# generating set in the group's setting; closure fills in the rest).
GEN_NAMES = {}
for sg in (7, 9):
    GEN_NAMES[sg] = ("my",)
for sg in (17, 18, 20, 24):
    GEN_NAMES[sg] = ("2z", "2x")
for sg in range(26, 47):
    GEN_NAMES[sg] = ("2z", "mx")
for sg in range(48, 75):
    GEN_NAMES[sg] = ("2z", "2x", "inv")
GEN_NAMES[80] = ("4z",)
for sg in (85, 86):
    GEN_NAMES[sg] = ("4z", "inv")
for sg in range(89, 99):
    GEN_NAMES[sg] = ("4z", "2x")
for sg in range(99, 111):
    GEN_NAMES[sg] = ("4z", "mx")
for sg in (111, 112, 113, 114, 121, 122):
    GEN_NAMES[sg] = ("-4z", "2x")
for sg in (115, 116, 117, 118, 119, 120):
    GEN_NAMES[sg] = ("-4z", "mx")
for sg in range(123, 143):
    GEN_NAMES[sg] = ("4z", "2x", "inv")
for sg in (151, 153):
    GEN_NAMES[sg] = ("3h", "2h1-10")
GEN_NAMES[158] = ("3h", "mh100")
GEN_NAMES[159] = ("3h", "mh1-10")
GEN_NAMES[163] = ("3h", "2h1-10", "inv")
GEN_NAMES[165] = ("3h", "2h100", "inv")
GEN_NAMES[184] = ("6h", "mh100")
GEN_NAMES[188] = ("-6h", "mh100")
GEN_NAMES[190] = ("-6h", "2h100")
GEN_NAMES[192] = ("6h", "2h100", "inv")
GEN_NAMES[201] = ("3xyz", "2z", "2x", "inv")
for sg in (208, 210, 214):
    GEN_NAMES[sg] = ("3xyz", "4z")
for sg in (218, 219, 220):
    GEN_NAMES[sg] = ("3xyz", "-4z")
for sg in (222, 223, 224, 226, 228):
    GEN_NAMES[sg] = ("3xyz", "4z", "inv")

# Known ITA special positions (structure-type knowledge): a candidate
# embedding must reproduce these orbit sizes, which pins the ORIGIN
# relative to the symmetry elements (symbol content alone cannot).
WYCKOFF_CONSTRAINTS = {
    48: [((0.25, 0.25, 0.25), 2)],          # Pnnn o2 2a
    50: [((0.25, 0.25, 0.0), 2)],           # Pban o2 2a
    60: [((0.0, 0.178, 0.25), 4)],          # Pbcn 4c (alpha-PbO2)
    64: [((0.0, 0.0, 0.0), 4)],             # Cmca 4a (2/m at origin)
    85: [((0.25, 0.75, 0.0), 2)],           # P4/n o2 2a
    # P4_122 4c (x,x,3/8) / P4_322 4c (x,x,5/8): the diagonal 2-fold
    # heights distinguish the enantiomorphic embeddings AND the z
    # origin (a quarter-turn-conjugated closure passes symbol
    # verification but swaps 1/8 <-> 3/8; round-4 audit finding).
    91: [((0.2, 0.2, 0.375), 4)],
    95: [((0.2, 0.2, 0.625), 4)],
    109: [((0.0, 0.0, 0.31), 4)],           # I4_1md 4a
    125: [((0.25, 0.25, 0.0), 2)],          # P4/nbm o2 2a
    126: [((0.25, 0.25, 0.25), 2)],         # P4/nnc o2 2a
    129: [((0.75, 0.25, 0.0), 2), ((0.25, 0.25, 0.26), 2)],  # P4/nmm o2
    130: [((0.25, 0.25, 0.31), 4)],         # P4/ncc o2 4c
    134: [((0.25, 0.75, 0.25), 2)],         # P4_2/nnm o2 2a
    201: [((0.25, 0.25, 0.25), 2)],         # Pn-3 o2 2a
    # I4_122 4a (0,0,0); I4_1cd 8a (0,0,z) (polar axis through origin)
    98: [((0.0, 0.0, 0.0), 4)],
    110: [((0.0, 0.0, 0.31), 8)],
    # F4_132 8a (0,0,0) + 16c (1/8,1/8,1/8)
    210: [((0.0, 0.0, 0.0), 8), ((0.125, 0.125, 0.125), 16)],
    # I4_132 8a (1/8,1/8,1/8), site symmetry 32 (round-4 audit finding:
    # an embedding giving orbit 16 here passed symbol verification)
    214: [((0.125, 0.125, 0.125), 8)],
    # P-43n 6d (1/4,0,1/2) (sodalite-framework Si site)
    218: [((0.25, 0.0, 0.5), 6)],
    # I-43d 12a (3/8,0,1/4) (eulytite Si; round-4 audit finding) +
    # 16c (x,x,x) (eulytite Bi)
    220: [((0.375, 0.0, 0.25), 12), ((0.085, 0.085, 0.085), 16)],
    222: [((0.25, 0.25, 0.25), 2)],         # Pn-3n o2 2a
    # Pm-3n 6c (1/4,0,1/2) (A15 Cr3Si Cr site)
    223: [((0.25, 0.0, 0.5), 6)],
    224: [((0.25, 0.25, 0.25), 2)],         # Pn-3m o2 2a (cuprite O)
    # Fm-3c 8a (1/4,1/4,1/4) + 8b (0,0,0) (NaZn13)
    226: [((0.25, 0.25, 0.25), 8), ((0.0, 0.0, 0.0), 8)],
}

# ITA group-subgroup origin consistency: ITA uses ONE consistent
# coordinate system per lattice family, so a group's ops must be a
# subset of its curated klassengleiche/translationengleiche supergroup
# at the same origin. {sg: (supergroup, 'proper'|'all')} — 'proper'
# keeps only det=+1 ops of the supergroup (e.g. I4_132 is the rotation
# subgroup of Ia-3d). Resolves ties that Wyckoff anchors alone cannot
# (round-4 audit: both I4_132 candidates satisfy the 8a anchor, only
# one embeds in garnet-pinned Ia-3d).
SUPERGROUP_CONSTRAINTS = {
    214: (230, "proper"),
}


def _supergroup_keys(sg_super: int, which: str):
    ops = SG.general_positions(sg_super)
    keys = set()
    for m, t in ops:
        m = np.asarray(m)
        if which == "proper" and round(np.linalg.det(m)) != 1:
            continue
        keys.add(SG._op_key(m, np.asarray(t, float)))
    return keys


def _orbit_size(ops, xyz, tol=1e-6):
    pts = []
    for m, t in ops:
        p = (np.asarray(m) @ np.asarray(xyz) + np.asarray(t)) % 1.0
        p = np.where(p > 1.0 - 1e-9, 0.0, p)
        if not any(
            np.all(np.minimum(np.abs(p - q), 1.0 - np.abs(p - q)) < tol)
            for q in pts
        ):
            pts.append(p)
    return len(pts)


_Q = (0.0, 0.25, 0.5, 0.75)
_H = (0.0, 0.5)
_SIXTHS = (0.0, 1 / 6, 1 / 3, 0.5, 2 / 3, 5 / 6)


def _grids(sg, name):
    """Candidate translations per generator."""
    if name == "inv":
        return [(0.0, 0.0, 0.0)]  # origin choice 2
    if name == "3xyz":
        return [(0.0, 0.0, 0.0)]  # cubic 3-fold through the origin
    if name in ("3h", "6h", "-6h"):
        return [(0.0, 0.0, z) for z in _SIXTHS]
    if name.startswith(("2h", "mh")):
        return [t for t in itertools.product(_H, _H, _H)]
    return [t for t in itertools.product(_Q, _Q, _Q)]


def _closure(gens, sg):
    """Generator closure + centering; None if it blows past the
    expected multiplicity (wrong translations). The pre-centering
    closure may legitimately generate the centering translations
    themselves (a d-glide squares to an F vector), so the bound is the
    FULL multiplicity; verify_group rejects inflated groups."""
    ident = (np.eye(3, dtype=int), np.zeros(3))
    ops = [ident]
    seen = {SG._op_key(*ident)}
    frontier = [ident]
    n_cent = len(SG.centering_translations(sg))
    limit = PG_ORDER[point_group(sg)] * n_cent
    while frontier:
        new = []
        for mg, tg in gens:
            mg = np.asarray(mg)
            tg = np.asarray(tg, dtype=float)
            for m0, t0 in frontier:
                m1 = mg @ m0
                t1 = (mg @ t0 + tg) % 1.0
                key = SG._op_key(m1, t1)
                if key not in seen:
                    seen.add(key)
                    op = (m1, t1)
                    ops.append(op)
                    new.append(op)
        frontier = new
        if len(ops) > limit:
            return None
    cents = SG.centering_translations(sg)
    if len(cents) > 1:
        full, keys = [], set()
        for c in cents:
            for m, t in ops:
                op = (m, (t + c) % 1.0)
                key = SG._op_key(*op)
                if key not in keys:
                    keys.add(key)
                    full.append(op)
        ops = full
    return ops


def _opset_key(ops):
    return frozenset(SG._op_key(m, t) for m, t in ops)


def _origin_score(ops, sg):
    """ITA-origin likeness: (site-symmetry order at the origin,
    direction-weighted tie-break).

    ITA places the origin on a site of highest site symmetry (for the
    double-origin centrosymmetric groups, on the inversion centre —
    already pinned by the generator grids). An operation contributes
    iff it FIXES the origin, i.e. t = 0 mod 1 (pure rotations /
    reflections through the origin; screws and glides never fix a
    point). The tie-break prefers pure elements about x over y over z
    (matching ITA's listings for e.g. P222_1 and C222_1, whose pure
    2-fold is along a).
    """
    count = 0
    weight = 0
    seen_m = set()
    axis_w = {(1, 0, 0): 4, (0, 1, 0): 2, (0, 0, 1): 1}
    from kikuchipy_tpu.crystallography.sg_symbols import _axis_of, _axis_of_neg

    for M, t in ops:
        M = np.asarray(M, int)
        key = tuple(M.ravel())
        if key in seen_m or np.array_equal(M, np.eye(3, dtype=int)):
            continue
        r = np.asarray(t, float)
        r = r - np.round(r)
        if np.allclose(r, 0.0, atol=1e-9):
            count += 1
            seen_m.add(key)
            det = int(round(np.linalg.det(M)))
            v = _axis_of(M) if det == 1 else _axis_of_neg(M)
            weight += axis_w.get(v, 0)
    return (count, weight)


def search_group(sg):
    names = GEN_NAMES[sg]
    cents = SG.centering_translations(sg)
    solutions = {}
    super_keys = None
    if sg in SUPERGROUP_CONSTRAINTS:
        super_keys = _supergroup_keys(*SUPERGROUP_CONSTRAINTS[sg])
    for trans in itertools.product(*(_grids(sg, n) for n in names)):
        gens = [(OPS[n], t) for n, t in zip(names, trans)]
        ops = _closure(gens, sg)
        if ops is None:
            continue
        if verify_group(ops, sg, cents):
            continue
        if any(
            _orbit_size(ops, xyz) != n
            for xyz, n in WYCKOFF_CONSTRAINTS.get(sg, ())
        ):
            continue
        if super_keys is not None and not all(
            SG._op_key(np.asarray(m), np.asarray(t, float)) in super_keys
            for m, t in ops
        ):
            continue
        key = _opset_key(ops)
        score = _origin_score(ops, sg)
        if key not in solutions or tuple(trans) < solutions[key][1]:
            # keep the lexicographically smallest translations for a
            # given op-set (purely cosmetic)
            solutions[key] = (score, tuple(trans), names)
    return solutions


def main():
    out = {}
    flagged = []
    for sg in sorted(GEN_NAMES):
        if sg in SG._SYMMORPHIC or sg in SG._NONSYMMORPHIC:
            continue  # hand-curated tables take precedence
        sols = search_group(sg)
        if not sols:
            print(f"SG {sg}: NO solution found", flush=True)
            flagged.append(sg)
            continue
        ranked = sorted(
            sols.values(), key=lambda v: (-v[0][0], -v[0][1], v[1])
        )
        best = ranked[0]
        if len(ranked) > 1 and ranked[1][0] == best[0]:
            print(
                f"SG {sg}: {len(ranked)} distinct op-sets, top score tied "
                f"({best[0]}): {[r[1] for r in ranked[:3]]} -> review",
                flush=True,
            )
            flagged.append(sg)
        out[sg] = (best[2], best[1])
        print(
            f"SG {sg} {HM_SYMBOLS[sg]}: {len(sols)} op-set(s), picked "
            f"{list(zip(best[2], best[1]))} (origin score {best[0]})",
            flush=True,
        )

    lines = [
        '"""Generated space-group generators (DO NOT EDIT BY HAND).',
        "",
        "Produced by tools/gen_spacegroups.py: for each group the",
        "generator translations were searched so the closure reproduces",
        "the group's Hermann-Mauguin symbol exactly under",
        "sg_symbols.verify_group (multiplicity, point group, screw and",
        "glide content with ITA printing rules, centrosymmetry), with",
        "inversion centres pinned at the origin (ITA origin choice 2)",
        "and cubic 3-folds through the origin. ITA-origin EMBEDDING is",
        "additionally pinned by WYCKOFF_CONSTRAINTS (famous-structure",
        "special-position orbit sizes; symbol content alone cannot fix",
        "the origin, and for enantiomorphic tetragonal groups a",
        "quarter-turn-conjugated closure even passes symbol checks) and",
        "SUPERGROUP_CONSTRAINTS (op-subset of a curated supergroup at",
        "the same origin). See that module for the verification",
        "semantics; tests/test_spacegroup.py re-verifies all 230 groups",
        "and the Wyckoff goldens on every run.",
        '"""',
        "",
        "GENERATED_GENERATORS = {",
    ]
    for sg in sorted(out):
        names, trans = out[sg]
        gen_str = ", ".join(
            f'("{n}", ({t[0]!r}, {t[1]!r}, {t[2]!r}))'
            for n, t in zip(names, trans)
        )
        lines.append(f"    {sg}: [{gen_str}],")
    lines.append("}")
    lines.append("")
    path = Path(__file__).resolve().parent.parent / (
        "kikuchipy_tpu/crystallography/_sg_generated.py"
    )
    path.write_text("\n".join(lines))
    print(f"wrote {path} with {len(out)} groups; flagged: {flagged}")


if __name__ == "__main__":
    main()
