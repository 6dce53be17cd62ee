"""Slippage cost models (SURVEY.md §2.9 D12–D13, D15)."""

from moonshot_spark.slippage.base import Slippage
from moonshot_spark.slippage.fixed import FixedSlippage
from moonshot_spark.slippage.borrowfee import BorrowFees

__all__ = ["Slippage", "FixedSlippage", "BorrowFees"]
