from .logging import MetricLogger, Timer
from .visualize import save_batch_visualization, save_depth_comparison

__all__ = ["MetricLogger", "Timer", "save_batch_visualization", "save_depth_comparison"]
