from nefes_tpu.evaluation.metrics import (
    ACCURACY_BUCKETS, pose_errors, pose_errors_jnp, accuracy_stats,
    summarize, load_pose_txt, save_pose_txt, rotation_angle_np,
)
from nefes_tpu.evaluation.golden import (
    evaluate_scene, evaluate_all, paper_result_dir,
    SEVEN_SCENES, CAMBRIDGE_SCENES,
)
