from .evaluate import (
    DADEvaluator,
    HeadAnnotation,
    evaluate,
    one_sided_chamfer_sq,
    print_evaluation_results,
    procrustes,
    zn_accuracy,
)
from .generate_gt import generate_gt

__all__ = [
    "DADEvaluator",
    "HeadAnnotation",
    "evaluate",
    "generate_gt",
    "procrustes",
    "one_sided_chamfer_sq",
    "zn_accuracy",
    "print_evaluation_results",
]
