from moonshot_spark.strategies.base import Moonshot
from moonshot_spark.strategies.ml import MoonshotML

__all__ = ["Moonshot", "MoonshotML"]
