from .api import make_parallel_step_fns
from .dp import make_dp_step_fns
from .gspmd import make_gspmd_step_fns, param_sharding_tree, state_sharding_tree
from .mesh import make_mesh, parse_mesh_spec

__all__ = [
    "make_parallel_step_fns",
    "make_dp_step_fns",
    "make_gspmd_step_fns",
    "param_sharding_tree",
    "state_sharding_tree",
    "make_mesh",
    "parse_mesh_spec",
]
