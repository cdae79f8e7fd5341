from .synthetic import make_batch_fn, random_3dmm, synthetic_batch

__all__ = ["synthetic_batch", "random_3dmm", "make_batch_fn"]
