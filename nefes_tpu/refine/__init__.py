from nefes_tpu.refine.losses import (
    feature_cosine_loss, masked_feature_cosine_loss,
)
from nefes_tpu.refine.pose_opt import (
    RefineConfig, refine_pose_single, refine_poses_batch,
    render_feature_image, fix_coord_supp_jnp,
)
from nefes_tpu.refine.apr_opt import (
    refine_apr_single, refine_apr_batch, refine_apr_verified,
    apply_verification, apr_pose,
    apr_pose_any,
)
