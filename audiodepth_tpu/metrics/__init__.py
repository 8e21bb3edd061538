from .errors import (EVAL_PRED_MIN, METRIC_NAMES, compute_errors_np,
                     compute_errors_batch)

__all__ = ["EVAL_PRED_MIN", "METRIC_NAMES", "compute_errors_np",
           "compute_errors_batch"]
