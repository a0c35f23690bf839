from diffpose_tpu.geometry.quaternion import qrot, qinverse
from diffpose_tpu.geometry.camera import (
    normalize_screen_coordinates,
    image_coordinates,
    world_to_camera,
    camera_to_world,
    project_to_2d,
    project_to_2d_linear,
)

__all__ = [
    "qrot",
    "qinverse",
    "normalize_screen_coordinates",
    "image_coordinates",
    "world_to_camera",
    "camera_to_world",
    "project_to_2d",
    "project_to_2d_linear",
]
