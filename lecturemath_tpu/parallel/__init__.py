from .mesh import MeshSpec, make_mesh, shard_params, shard_batch
