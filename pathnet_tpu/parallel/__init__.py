from .mesh import make_mesh, shard_spec, sharded_train_step, replicate

__all__ = ["make_mesh", "shard_spec", "sharded_train_step", "replicate"]
