from active_tracking_rl_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec, make_mesh, shard_learner, host_init)
