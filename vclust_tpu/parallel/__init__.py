from .mesh import make_mesh, sharded_pair_counts  # noqa: F401
