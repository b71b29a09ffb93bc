from diffdock_tpu.geometry.rotations import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    axis_angle_to_quaternion,
    quaternion_to_matrix,
    matrix_to_quaternion,
    quaternion_to_axis_angle,
    random_rotation_matrix,
)
from diffdock_tpu.geometry.kabsch import kabsch_rotation, kabsch_align
from diffdock_tpu.geometry.torsion import apply_torsion_updates, rotatable_bond_mask
from diffdock_tpu.geometry.rigid import modify_conformer

__all__ = [
    "axis_angle_to_matrix",
    "matrix_to_axis_angle",
    "axis_angle_to_quaternion",
    "quaternion_to_matrix",
    "matrix_to_quaternion",
    "quaternion_to_axis_angle",
    "random_rotation_matrix",
    "kabsch_rotation",
    "kabsch_align",
    "apply_torsion_updates",
    "rotatable_bond_mask",
    "modify_conformer",
]
