from .mesh import make_mesh, MeshAxes
from . import partition
