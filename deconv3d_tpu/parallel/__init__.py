from .mesh import make_mesh, shard_chains

__all__ = ["make_mesh", "shard_chains"]
