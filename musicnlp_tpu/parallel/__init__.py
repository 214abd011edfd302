from musicnlp_tpu.parallel.mesh import (
    batch_specs, make_mesh, param_specs, replicated_specs, shard_pytree,
)
