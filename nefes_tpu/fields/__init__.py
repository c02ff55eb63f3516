from nefes_tpu.fields.embedder import EmbedConfig, embed, cosine_window
from nefes_tpu.fields.nerfh_nff import (
    FEATURE_DIM, NeRFHNFF, ExposureMLP, FusionNet, affine_color_transform,
)
from nefes_tpu.fields.activation import trunc_exp, trunc_softplus
from nefes_tpu.fields.legacy import PlainNeRF, NeRFW
from nefes_tpu.fields.hashgrid import (
    HashGridEncoding, NeRFHTcnn, spherical_harmonics_deg4,
)
from nefes_tpu.fields.decoder import GiraffeDecoder
