"""Scene layer: meshes, transforms, camera, materials, lights, aggregation."""

from .camera import Camera  # noqa: F401
from .material import MaterialTable, MATTE, MIRROR, GLASS  # noqa: F401
from .light import LightTable, POINT_LIGHT, AREA_LIGHT  # noqa: F401
from .mesh import Mesh, load_ply, save_ply  # noqa: F401
from .scene import Scene, SceneBuilder  # noqa: F401
from .transform import Transform, translate, scale, rotate  # noqa: F401
