from .sharded import ShardedSearch, ShardedText, make_mesh

__all__ = ["ShardedSearch", "ShardedText", "make_mesh"]
