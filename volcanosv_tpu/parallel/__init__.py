from .mesh import make_mesh, MeshAxes
from .step import sharded_align_step, build_sharded_align_step
