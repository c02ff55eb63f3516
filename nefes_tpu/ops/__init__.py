"""TPU-first array primitives shared by the hot render path."""

from nefes_tpu.ops.sorting import (  # noqa: F401
    onehot_gather,
    rank_sort,
    searchsorted_right,
)
