from .metrics import (
    compare_corr,
    compare_ergas,
    compare_mpsnr,
    compare_mssim,
    compare_rmse,
    compare_sam,
    color_correction,
    quality_assessment,
    sum_dict,
)
from .jax_metrics import quality_assessment_jax

__all__ = [
    "compare_corr",
    "compare_ergas",
    "compare_mpsnr",
    "compare_mssim",
    "compare_rmse",
    "compare_sam",
    "color_correction",
    "quality_assessment",
    "quality_assessment_jax",
    "sum_dict",
]
