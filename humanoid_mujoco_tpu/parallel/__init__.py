from .mesh import make_mesh, sharded_sampling_plan, shard_batch

__all__ = ["make_mesh", "sharded_sampling_plan", "shard_batch"]
