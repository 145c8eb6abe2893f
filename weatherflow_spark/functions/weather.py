"""Derived meteorological metrics (reference F11-F14).

Behavioral spec: reference ``dags/etl.py:71-84`` (``add_calc_attributes``
task). Pure per-row double arithmetic → plain column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from weatherflow_spark.functions.numeric import round_half_up


def dew_point(temp_c: Column, humidity: Column) -> Column:
    """Simple dew-point approximation, rounded to 2 dp.

    Spec: reference dags/etl.py:78 —
    ``round(temp - ((100 - humidity) / 5), 2)`` (°C). Rounding is the
    engine's deterministic half-up (see functions/numeric.py).
    """
    return round_half_up(temp_c - (F.lit(100.0) - humidity) / F.lit(5.0), 2)


def celsius_to_fahrenheit(temp_c: Column) -> Column:
    """Spec: reference dags/etl.py:80 (``temp * 1.8 + 32``) — an
    internal intermediate there, never emitted; exposed here as a
    first-class function."""
    return temp_c * F.lit(1.8) + F.lit(32.0)


def heat_index(temp_c: Column, humidity: Column) -> Column:
    """Steadman simple heat-index formula, computed in °F and
    back-converted to °C, rounded to 2 dp.

    Spec: reference dags/etl.py:80-82 —
    ``HI_F = 0.5*(T_F + 61.0 + (T_F - 68.0)*1.2 + RH*0.094)``;
    ``round((HI_F - 32) * 5/9, 2)``. Applied unconditionally, exactly
    like the reference (no Rothfusz switch above 80 °F).
    """
    t_f = celsius_to_fahrenheit(temp_c)
    hi_f = F.lit(0.5) * (
        t_f + F.lit(61.0) + (t_f - F.lit(68.0)) * F.lit(1.2) + humidity * F.lit(0.094)
    )
    return round_half_up((hi_f - F.lit(32.0)) * F.lit(5.0) / F.lit(9.0), 2)


def add_calc_attributes(
    df: DataFrame, temp_col: str = "temp", humidity_col: str = "humidity"
) -> DataFrame:
    """The reference's ``add_calc_attributes`` task as one projection.

    Spec: reference dags/etl.py:71-84 — emits exactly
    ``dew_point`` and ``heat_index`` (temp_F stays internal,
    etl.py:77-83).
    """
    return df.withColumns(
        {
            "dew_point": dew_point(F.col(temp_col), F.col(humidity_col)),
            "heat_index": heat_index(F.col(temp_col), F.col(humidity_col)),
        }
    )
