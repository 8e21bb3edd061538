from .errors import METRIC_NAMES, compute_errors_np, compute_errors_batch

__all__ = ["METRIC_NAMES", "compute_errors_np", "compute_errors_batch"]
