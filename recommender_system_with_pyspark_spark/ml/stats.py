"""Distributed statistics (SURVEY §2.8 M6-M7).

``Correlation.corr`` and ``ChiSquareTest`` collect a (features)² matrix /
contingency tables to the driver (`functions.py:159` does `.collect()[0][0]`)
— fine at the reference's ~25 features, a documented ceiling here
(CORR_MAX_FEATURES) with the pairwise ``F.corr`` aggregate as the
unbounded-scale alternative (see queries_relational.correlation).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CORR_MAX_FEATURES = 2_000


def correlation_matrix(
    df: DataFrame, columns: Sequence[str], method: str = "pearson"
) -> DataFrame:
    """M6 — full correlation matrix (`functions.py:153-171`), returned as
    tidy (feature_a, feature_b, corr) rows instead of a driver-side numpy
    heatmap. One distributed Gramian pass; driver holds only len(columns)²
    doubles."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import Correlation

    cols = list(columns)
    if len(cols) > CORR_MAX_FEATURES:
        raise ValueError(
            f"{len(cols)} features exceeds the driver-side matrix ceiling "
            f"({CORR_MAX_FEATURES}); compute pairwise F.corr aggregates instead"
        )
    assembled = VectorAssembler(inputCols=cols, outputCol="_v").transform(df.select(*cols))
    matrix = Correlation.corr(assembled, "_v", method).collect()[0][0].toArray()
    rows = [
        (cols[i], cols[j], round(float(matrix[i][j]), 6))
        for i in range(len(cols))
        for j in range(len(cols))
    ]
    return df.sparkSession.createDataFrame(rows, "feature_a string, feature_b string, corr double")


def chi_square_test(
    df: DataFrame, feature_cols: Sequence[str], label_col: str
) -> DataFrame:
    """M7 — ChiSquareTest (imported, never called by the reference —
    `functions.py:5`; provided as promised by SURVEY §2.8). Returns one row
    per feature: (feature, p_value, dof, statistic)."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import ChiSquareTest

    cols = list(feature_cols)
    assembled = VectorAssembler(inputCols=cols, outputCol="_v").transform(
        df.select(*cols, label_col)
    )
    res = ChiSquareTest.test(assembled, "_v", label_col).first()
    rows = [
        (cols[i], round(float(res.pValues[i]), 6), int(res.degreesOfFreedom[i]),
         round(float(res.statistics[i]), 6))
        for i in range(len(cols))
    ]
    return df.sparkSession.createDataFrame(
        rows, "feature string, p_value double, dof int, statistic double"
    )
