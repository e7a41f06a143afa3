from .mesh import make_data_mesh, shard_train_step, shard_eval_step  # noqa: F401
