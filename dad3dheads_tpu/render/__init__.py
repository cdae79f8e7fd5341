from .lighting import RenderPipeline
from .pncc import PNCCEstimator, compute_ncc_color_codes, pncc
from .rasterizer import get_normal, rasterize, rasterize_buffers, shade
from .uv_texture import UVTextureCreator

__all__ = [
    "rasterize",
    "rasterize_buffers",
    "shade",
    "get_normal",
    "RenderPipeline",
    "PNCCEstimator",
    "pncc",
    "compute_ncc_color_codes",
    "UVTextureCreator",
]
