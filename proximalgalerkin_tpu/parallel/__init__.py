from .sharding import device_mesh, shard_form, shard_problem, replicated

__all__ = ["device_mesh", "shard_form", "shard_problem", "replicated"]
