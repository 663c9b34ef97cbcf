from .mesh import make_mesh, shard_plan_inputs  # noqa: F401
