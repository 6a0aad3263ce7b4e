from .rotations import (
    euler_to_rotmat,
    rotmat_to_euler,
    rotmat_to_quat,
    quat_to_expmap,
    expmap_to_rotmat,
    rotmat_to_expmap,
)
from .kinematics import (
    H36M_PARENTS,
    H36M_OFFSETS,
    H36M_ROT_IND,
    H36M_EXPMAP_IND,
    H36M_POS_IND,
    forward_kinematics,
    revert_coordinate_space,
)
from .camera import apply_affine_transform, camera_projection
from .normalization import (
    normalization_stats,
    normalize,
    unnormalize,
    revert_output_format,
)
