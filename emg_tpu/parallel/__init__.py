from emg_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    mesh_from_config,
    batch_pspec,
    param_pspec,
    shard_batch,
    shard_params,
    param_shardings,
    replicated,
)
from emg_tpu.parallel.train_step import (  # noqa: F401
    make_train_step,
    make_train_window,
    make_eval_step,
    compute_losses,
)
