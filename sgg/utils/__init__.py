"""sgg.utils — shared utilities (estimators, profiling, debug helpers)."""

from sgg.utils.gumbel import gumbel_softmax, sample_gumbel

__all__ = ["gumbel_softmax", "sample_gumbel"]
