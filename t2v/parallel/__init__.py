from t2v.parallel.mesh import MeshConfig, make_mesh
from t2v.parallel.sharding import param_sharding_rules, shard_params, activation_spec

__all__ = [
    "MeshConfig",
    "make_mesh",
    "param_sharding_rules",
    "shard_params",
    "activation_spec",
]
