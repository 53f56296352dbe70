from . import maths, types  # noqa: F401
