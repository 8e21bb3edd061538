from .basic import l1_loss, l2_loss, silog_loss, combined_loss, make_criterion

__all__ = [
    "l1_loss",
    "l2_loss",
    "silog_loss",
    "combined_loss",
    "make_criterion",
]
