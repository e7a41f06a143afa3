from .mesh import (  # noqa: F401
    init_distributed,
    make_data_mesh,
    shard_eval_step,
    shard_train_step,
)
