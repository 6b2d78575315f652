from .sharded import ShardedSearch, make_mesh

__all__ = ["ShardedSearch", "make_mesh"]
