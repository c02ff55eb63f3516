from nefes_tpu.render.sampling import (
    stratified_samples, sample_pdf, hierarchical_samples,
)
from nefes_tpu.render.compositor import composite
from nefes_tpu.render.renderer import RenderConfig, render_rays, render_image
