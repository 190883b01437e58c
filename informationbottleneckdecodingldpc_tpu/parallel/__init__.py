"""Device-mesh parallelism: batch sharding, psum counters, lockstep exit."""

from .mesh import make_mesh, data_parallel_spec, psum_convergence_reduce

__all__ = ["make_mesh", "data_parallel_spec", "psum_convergence_reduce"]
