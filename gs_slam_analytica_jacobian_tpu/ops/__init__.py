from . import camera_math, gaussian_math, lie, sh  # noqa: F401
