from snuffy_tpu.parallel.mesh import MeshSpec, make_mesh, factor_devices
from snuffy_tpu.parallel.sharded_train import (
    make_param_shardings,
    make_sharded_batch_train_step,
)
