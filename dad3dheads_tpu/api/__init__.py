from .export import ExportedFaceMeshPredictor, export_predictor
from .predictor import DEFAULT_CONFIG, FaceMeshPredictor, save_predictor_checkpoint

__all__ = [
    "FaceMeshPredictor",
    "DEFAULT_CONFIG",
    "save_predictor_checkpoint",
    "ExportedFaceMeshPredictor",
    "export_predictor",
]
