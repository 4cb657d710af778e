"""Crystallography: symmetry, orientation sampling, crystal maps, and
reciprocal-lattice tools (replacing the reference's orix/diffsims
dependencies)."""

from kikuchipy_tpu.crystallography.crystal_map import CrystalMap, Phase, PhaseList
from kikuchipy_tpu.crystallography.ipf import IPFColorKeyTSL, ipf_color
from kikuchipy_tpu.crystallography.reciprocal import (
    Lattice,
    ReciprocalLatticeVectors,
    electron_wavelength,
)
from kikuchipy_tpu.crystallography.spacegroup import (
    centering_letter,
    centering_translations,
    expand_atoms,
    general_positions,
)
from kikuchipy_tpu.crystallography.sampling import (
    disorientation_angle,
    in_fundamental_zone,
    reduce_to_fundamental_zone,
    sample_fundamental_zone,
    super_fibonacci,
)
from kikuchipy_tpu.crystallography.symmetry import (
    PointGroup,
    get_point_group,
    point_group_from_space_group,
    proper_rotations,
)

__all__ = [
    "CrystalMap",
    "IPFColorKeyTSL",
    "ipf_color",
    "Lattice",
    "centering_letter",
    "centering_translations",
    "expand_atoms",
    "general_positions",
    "Phase",
    "PhaseList",
    "PointGroup",
    "ReciprocalLatticeVectors",
    "disorientation_angle",
    "electron_wavelength",
    "get_point_group",
    "in_fundamental_zone",
    "point_group_from_space_group",
    "proper_rotations",
    "reduce_to_fundamental_zone",
    "sample_fundamental_zone",
    "super_fibonacci",
]
