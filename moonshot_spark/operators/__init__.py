"""Domain operators (SURVEY.md §2.9) re-expressed as Spark transformations."""

from moonshot_spark.operators.weights import (
    allocate_equal_weights,
    allocate_fixed_weights,
    allocate_fixed_weights_capped,
    allocate_market_neutral_fixed_weights_capped,
    neutralize_weights,
)
from moonshot_spark.operators.turnover import positions_to_turnover

__all__ = [
    "allocate_equal_weights",
    "allocate_fixed_weights",
    "allocate_fixed_weights_capped",
    "allocate_market_neutral_fixed_weights_capped",
    "neutralize_weights",
    "positions_to_turnover",
]
