"""Grouped Pandas-UDF operators — the sanctioned Python escape hatch.

Rule of the engine (SURVEY.md §7): built-in Column expressions first;
``applyInPandas`` (Arrow-batched, one group per call) only when the
per-group logic genuinely cannot be said relationally — model scoring,
scipy fits, bespoke time-series logic. These two operators are the
template: a per-group robust z-score (expressible in SQL, implemented
both ways so tests can prove the UDF path agrees with the relational
path) and a per-group OLS trend fit (the realistic can't-say-it-in-SQL
case once the model is nontrivial).

Scale: groups are hash-partitioned; each Arrow batch holds one group, so
memory is bounded by the largest group — salt mega-groups first
(plans/skew.py) if the key is power-law.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_by_group_pandas(df: DataFrame, group: str, value: str) -> DataFrame:
    """Per-group (x − mean)/std via applyInPandas."""
    gt = df.schema[group].dataType.simpleString()
    vt = df.schema[value].dataType.simpleString()
    out_schema = f"{group} {gt}, {value} {vt}, z DOUBLE"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value].std()
        z = (pdf[value] - pdf[value].mean()) / std if std and std > 0 else 0.0
        return pd.DataFrame({group: pdf[group], value: pdf[value], "z": z})

    return df.select(group, value).groupBy(group).applyInPandas(fit, out_schema)


def zscore_by_group_relational(df: DataFrame, group: str, value: str) -> DataFrame:
    """The same z-score without Python — the preferred spelling."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group)
    mean = F.mean(value).over(w)
    std = F.stddev_samp(value).over(w)
    return df.select(
        group,
        value,
        F.when(std > 0, (F.col(value) - mean) / std).otherwise(F.lit(0.0)).alias("z"),
    )


def trend_by_group(df: DataFrame, group: str, x: str, y: str) -> DataFrame:
    """Per-group OLS slope/intercept of y~x via numpy inside applyInPandas."""
    import numpy as np

    gt = df.schema[group].dataType.simpleString()
    out_schema = f"{group} {gt}, slope DOUBLE, intercept DOUBLE, n LONG"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = pdf[x].astype("float64").to_numpy()
        ys = pdf[y].astype("float64").to_numpy()
        if len(xs) >= 2 and np.ptp(xs) > 0:
            slope, intercept = np.polyfit(xs, ys, 1)
        else:
            slope, intercept = 0.0, float(ys.mean()) if len(ys) else 0.0
        return pd.DataFrame(
            {group: [pdf[group].iloc[0]], "slope": [slope],
             "intercept": [intercept], "n": [len(pdf)]}
        )

    return df.select(group, x, y).groupBy(group).applyInPandas(fit, out_schema)
