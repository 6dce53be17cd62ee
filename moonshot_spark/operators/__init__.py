"""Domain operators (SURVEY.md §2.9) re-expressed as Spark transformations."""

from moonshot_spark.operators.weights import (
    allocate_equal_weights,
    allocate_fixed_weights,
    allocate_fixed_weights_capped,
    allocate_market_neutral_fixed_weights_capped,
    neutralize_weights,
)
from moonshot_spark.operators.turnover import positions_to_turnover
from moonshot_spark.operators.ranking import exact_ntile
from moonshot_spark.operators.ols import fit_ols, fit_logistic_irls

__all__ = [
    "exact_ntile",
    "fit_ols",
    "fit_logistic_irls",
    "allocate_equal_weights",
    "allocate_fixed_weights",
    "allocate_fixed_weights_capped",
    "allocate_market_neutral_fixed_weights_capped",
    "neutralize_weights",
    "positions_to_turnover",
]
