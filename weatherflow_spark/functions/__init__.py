"""Column-expression builders: the engine's scalar-function surface.

Every row-at-a-time Python derivation in the reference becomes a
named, unit-tested Catalyst expression here — JVM-side, inside
whole-stage codegen, no Python in the hot path.
"""

from weatherflow_spark.functions.calendar import (
    epoch_to_local_ts,
    quarter_bucket,
    season_bucket,
    ts_diff_minutes,
    enrich_datetime,
)
from weatherflow_spark.functions.weather import (
    dew_point,
    celsius_to_fahrenheit,
    heat_index,
    add_calc_attributes,
)

__all__ = [
    "epoch_to_local_ts",
    "quarter_bucket",
    "season_bucket",
    "ts_diff_minutes",
    "enrich_datetime",
    "dew_point",
    "celsius_to_fahrenheit",
    "heat_index",
    "add_calc_attributes",
]
