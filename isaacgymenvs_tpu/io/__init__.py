from .mjcf import load_mjcf  # noqa: F401
from .urdf import load_urdf, urdf_effort_limits  # noqa: F401
