from .flame import FlameModel, FlameParams, flame_decode
from .head_mesh import HeadMesh
from .landmarks import LandmarkEmbedding, get_68_landmarks
from .lbs import lbs
from .projection import (
    calculate_paddings,
    heatmap_to_keypoints,
    normalize_to_cube,
    project_vertices_onto_image,
)
from .rotation import RPY, calculate_rpy, rodrigues, rot_mat_from_6dof

__all__ = [
    "FlameModel",
    "FlameParams",
    "flame_decode",
    "HeadMesh",
    "LandmarkEmbedding",
    "get_68_landmarks",
    "lbs",
    "calculate_paddings",
    "heatmap_to_keypoints",
    "normalize_to_cube",
    "project_vertices_onto_image",
    "RPY",
    "calculate_rpy",
    "rodrigues",
    "rot_mat_from_6dof",
]
