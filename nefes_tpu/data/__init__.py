from nefes_tpu.data.scene import SceneData, compute_histograms
from nefes_tpu.data.histograms import (
    luminance_histogram, luminance_histogram_jnp, luminance,
)
from nefes_tpu.data.seven_scenes import (
    load_7scenes_colmap, load_7scenes_dslam, quat_poses_to_w2c,
)
from nefes_tpu.data.cambridge import load_cambridge, load_semantic_mask
from nefes_tpu.data.synthetic import (
    make_synthetic_scene, blob_field, look_at_pose, render_gt_features,
)
