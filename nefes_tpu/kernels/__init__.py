"""Pallas TPU kernels — the tiny-cuda-nn replacement layer (SURVEY §2.9)."""

from nefes_tpu.kernels.fused_field import (  # noqa: F401
    FieldSpec, fused_field_apply, make_fused_field, pack_params,
    weight_names,
)
