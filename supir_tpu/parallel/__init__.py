from supir_tpu.parallel.mesh import make_mesh
from supir_tpu.parallel.sharding import (
    batch_sharding,
    fsdp_param_shardings,
    replicated,
)
