"""Query catalog package: importing this module
registers every catalog query (same public surface as the original
single-module ``moonshot_spark.queries``: ``QUERIES``, ``ORACLES``,
``register``, ``ensure_session_confs``).  Domain modules register on
import; ``_base`` holds the registry and shared fragments."""

from moonshot_spark.queries._base import (  # noqa: F401
    ORACLES, QUERIES, QueryFn, ensure_session_confs, register,
)

from moonshot_spark.queries import panel as _panel  # noqa: F401,E402
from moonshot_spark.queries import warehouse as _warehouse  # noqa: F401,E402
from moonshot_spark.queries import backtest as _backtest  # noqa: F401,E402
from moonshot_spark.queries import datapipe as _datapipe  # noqa: F401,E402
from moonshot_spark.queries import analytics as _analytics  # noqa: F401,E402
from moonshot_spark.queries import streaming as _streaming  # noqa: F401,E402
