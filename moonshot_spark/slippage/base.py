"""Slippage base class (reference: moonshot/slippage/base.py:17-50).

A slippage model maps (turnover, position, price columns) → a slippage
Column (fraction of account equity), mirroring the reference's
``get_slippage(turnover, positions, prices)`` DataFrame contract but as a
column expression over the single-lineage panel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


class Slippage:

    def slippage_expr(self, df: DataFrame, turnover: Column,
                      position: Column) -> Column:
        """Return the slippage column.  ``df`` is the panel (for models that
        need price/auxiliary columns, e.g. borrow fees)."""
        raise NotImplementedError
