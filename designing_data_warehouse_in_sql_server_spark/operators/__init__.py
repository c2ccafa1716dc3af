from .cleaning import cap_outliers_zscore, dedupe, impute_group_mean
from .scd2 import SCD2_OPEN_END, scd2_apply
from .watermark import high_watermarks, mark_processed

__all__ = [
    "cap_outliers_zscore",
    "dedupe",
    "impute_group_mean",
    "SCD2_OPEN_END",
    "scd2_apply",
    "high_watermarks",
    "mark_processed",
]
