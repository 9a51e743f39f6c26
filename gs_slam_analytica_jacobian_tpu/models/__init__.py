from .camera import Camera, PoseState  # noqa: F401
