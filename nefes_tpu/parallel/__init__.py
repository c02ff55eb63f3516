from nefes_tpu.parallel.mesh import (
    make_mesh, replicated, batch_sharding, batch_ray_sharding,
    shard_batch, replicate,
)
from nefes_tpu.parallel.train_dp import (
    make_sharded_train_step, render_rays_sharded,
    refine_apr_sharded, refine_poses_sharded,
)
