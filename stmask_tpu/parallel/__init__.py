from .mesh import initialize_multihost, make_mesh, replicate, shard_batch

__all__ = ['initialize_multihost', 'make_mesh', 'replicate', 'shard_batch']
