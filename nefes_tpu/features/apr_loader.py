"""APR model loading + dispatch — the load_APR_and_FeatureNet equivalent
(reference script/dm/direct_pose_model.py:109-173).

``load_apr`` builds the requested pose estimator, converts its pretrained
torch checkpoint when a path is given (random init otherwise — smoke
mode), and returns a uniform ``(module, variables, pose_fn)`` triple where
``pose_fn(variables, image_hw3) -> (3, 4) pose`` hides the per-family
output conventions (12-vector vs quaternion dict)."""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np


def load_apr(estimator_type: str, ckpt_path: str | None, image_hw: tuple,
             rng, feature_dim: int = 128, dataset_type: str = "7Scenes",
             num_scenes: int = 7, pose_avg_stats=None):
    """estimator_type: PoseNet | PoseNetV2 | EfficientNetB3 | MapNet |
    MsTransformer | DFNet (dm/options.py:130 choices + the zoo families).

    Returns (module, variables, pose_fn). pose_fn output is the raw
    (3, 4) matrix in the APR's native frame — callers apply svd_reg /
    fix_coord_supp as the reference does.
    """
    from nefes_tpu.features.convert import load_torch_state_dict
    H, W = image_hw

    def _vars(module, convert_fn, init_shape=(1, *image_hw, 3), **init_kw):
        if ckpt_path:
            return convert_fn(load_torch_state_dict(ckpt_path))
        return module.init(rng, jnp.zeros(init_shape), **init_kw)

    if estimator_type == "DFNet":
        from nefes_tpu.features.convert import convert_dfnet
        from nefes_tpu.features.dfnet import DFNet
        module = DFNet(output_dim=feature_dim)
        variables = _vars(module, convert_dfnet,
                          upsample_hw=(H, W))

        def pose_fn(v, image):
            _, p12 = module.apply(v, image[None], return_feature=False,
                                  return_pose=True)
            return p12.reshape(3, 4)

    elif estimator_type in ("PoseNet", "PoseNetRes34"):
        # reference 'PoseNet' choice loads PoseNet_res34 via load_PoseNet
        from nefes_tpu.features.convert_backbones import convert_posenet_res34
        from nefes_tpu.features.posenet import PoseNetRes34
        module = PoseNetRes34()
        variables = _vars(module, convert_posenet_res34)

        def pose_fn(v, image):
            return module.apply(v, image[None]).reshape(3, 4)

    elif estimator_type == "PoseNetV2":
        from nefes_tpu.features.convert_backbones import convert_posenet_v2
        from nefes_tpu.features.posenet import PoseNetV2
        module = PoseNetV2()
        variables = _vars(module, convert_posenet_v2)

        def pose_fn(v, image):
            return module.apply(v, image[None]).reshape(3, 4)

    elif estimator_type == "EfficientNetB3":
        from nefes_tpu.features.convert_backbones import (
            convert_efficientnet_b3_apr,
        )
        from nefes_tpu.features.posenet import EfficientNetB3APR
        module = EfficientNetB3APR()
        variables = _vars(module, convert_efficientnet_b3_apr)

        def pose_fn(v, image):
            return module.apply(v, image[None]).reshape(3, 4)

    elif estimator_type == "MapNet":
        from nefes_tpu.features.convert_backbones import convert_mapnet
        from nefes_tpu.features.posenet import MapNet
        module = MapNet()
        variables = _vars(module, convert_mapnet)

        def pose_fn(v, image):
            return module.apply(v, image[None]).reshape(3, 4)

    elif estimator_type == "MsTransformer":
        from nefes_tpu.features.convert_backbones import convert_mstransformer
        from nefes_tpu.features.mstransformer import (
            MSTransPoseNet, ems_pose_to_matrix,
        )
        module = MSTransPoseNet(num_scenes=num_scenes)
        variables = _vars(module, lambda sd: convert_mstransformer(
            sd, num_scenes=num_scenes))
        pas = (np.asarray(pose_avg_stats)
               if pose_avg_stats is not None else np.eye(4)[:3])

        def pose_fn(v, image):
            out = module.apply(v, image[None])
            return ems_pose_to_matrix(out["pose"], dataset_type, pas)[0]

    else:
        raise NotImplementedError(
            f"PoseEstimatorType {estimator_type!r} "
            "(NetVlad has no model to load, direct_pose_model.py:166-168)")

    return module, variables, pose_fn


PoseFn = Callable[[dict, jnp.ndarray], jnp.ndarray]
