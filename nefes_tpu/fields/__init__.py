from nefes_tpu.fields.embedder import EmbedConfig, embed, cosine_window
from nefes_tpu.fields.nerfh_nff import (
    FEATURE_DIM, NeRFHNFF, ExposureMLP, FusionNet, affine_color_transform,
)
