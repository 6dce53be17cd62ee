"""Engine exceptions at the reference's import path.

The reference exposes ``moonshot.exceptions.MoonshotError`` /
``MoonshotParameterError`` (reference ``moonshot/exceptions.py:16-21``);
users catch them around backtest/trade calls.  The classes are defined in
``strategies.base`` (they are raised throughout the strategy surface) and
re-exported here so ``from moonshot_spark.exceptions import ...`` works
exactly like the reference import.
"""

from moonshot_spark.strategies.base import (
    MoonshotError, MoonshotParameterError,
)

__all__ = ["MoonshotError", "MoonshotParameterError"]
