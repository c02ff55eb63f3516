from nefes_tpu.geometry.se3 import (
    skew, so3_exp, so3_left_jacobian, se3_exp, make_c2w, pack_se3,
    to_homogeneous, compose_delta, learn_pose, quat_to_rotmat,
    rotmat_to_quat, rotation_angle, orthogonalize_rotation,
)
from nefes_tpu.geometry.transforms import (
    WorldSetup, average_pose, center_poses, dslam_to_opengl,
    colmap_to_opengl_c2w, cambridge_to_opengl, rescale_translations,
    fix_coord_7scenes, fix_coord_7scenes_colmap, fix_coord_cambridge,
    fix_coord_supp, to_hom,
)
from nefes_tpu.geometry.rays import get_rays, get_ray_at, ndc_rays
