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


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
    pair_name: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Mutual information (bits) between two categorical columns, plus the
    normalized variant nmi = MI / sqrt(H(X)·H(Y)) — the feature-selection
    / redundancy signal ChiSquareTest (M7) doesn't give you: MI measures
    HOW MUCH knowing one column tells you about the other, on a scale
    comparable across feature pairs.

        MI = Σ_{x,y} p(x,y) · log2( p(x,y) / (p(x)·p(y)) )

    Scale shape: ONE partial-aggregating groupBy over (x, y) reduces the
    table to its joint-frequency frame (|X|·|Y| cells — tiny for real
    categoricals); marginals, entropies and the MI fold all run on that
    frame with broadcast joins back. The fact table is scanned once and
    shuffles only distinct value pairs. Degenerate columns (zero entropy)
    yield nmi = null, mi = 0.

    Returns one row: (pair, mi_bits, nmi, n_rows, n_cells).
    """
    name = pair_name or f"{x_col}|{y_col}"
    joint = (
        df.select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
        .groupBy("_x", "_y")
        .agg(F.count(F.lit(1)).cast("double").alias("_cxy"))
    )
    px = joint.groupBy("_x").agg(F.sum("_cxy").alias("_cx")).withColumnRenamed("_x", "_px_x")
    py = joint.groupBy("_y").agg(F.sum("_cxy").alias("_cy")).withColumnRenamed("_y", "_py_y")
    tot = joint.agg(F.sum("_cxy").alias("_n"))
    # NULL is a legitimate category (groupBy keeps it); the marginal joins
    # must be NULL-SAFE or every null-keyed cell silently drops out of the
    # MI sum while the total still counts its rows — probabilities then no
    # longer sum to 1 and the statistic is wrong on any column with nulls
    cells = (
        joint.join(F.broadcast(px), F.col("_x").eqNullSafe(F.col("_px_x")))
        .join(F.broadcast(py), F.col("_y").eqNullSafe(F.col("_py_y")))
        .crossJoin(F.broadcast(tot))
    )
    p_xy = F.col("_cxy") / F.col("_n")
    p_x = F.col("_cx") / F.col("_n")
    p_y = F.col("_cy") / F.col("_n")
    mi = F.sum(p_xy * F.log2(p_xy / (p_x * p_y)))
    hx = -F.sum(F.when(F.col("_cxy") > 0, p_xy * F.log2(p_x)))  # Σp(x,y)log p(x) = Σp(x)log p(x)
    hy = -F.sum(F.when(F.col("_cxy") > 0, p_xy * F.log2(p_y)))
    return cells.agg(
        F.lit(name).alias("pair"),
        F.round(mi, round_to).alias("mi_bits"),
        F.round(
            F.when(
                (hx > 0) & (hy > 0), mi / F.sqrt(hx * hy)
            ),
            round_to,
        ).alias("nmi"),
        F.sum("_cxy").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Classifier calibration diagnostics — the evaluator the reference's
    AUC-centric surface (M19–M21) lacks: a model can rank perfectly and
    still lie about probabilities, and calibration is what decides
    whether a 0.9 score can be TREATED as 90%. Scores (in [0, 1]) are
    equal-width-bucketed; per bucket the report compares mean predicted
    score against the observed positive rate, and the summary folds into
    the expected calibration error and Brier score.

    One partial-aggregating groupBy over at most ``n_bins`` groups — the
    fact table is scanned once, the calibration fold runs on the tiny
    bucket frame. All arithmetic is plain IEEE double + integer counts,
    reproducible closed-form by any engine.

    Returns one row per non-empty bucket: (bin, n, mean_score,
    positive_rate, abs_gap) plus the same ece/brier on every row (they
    are corpus-level scalars; keeping the output single-table makes the
    report one artifact)."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    binned = df.select(
        F.least(F.lit(n_bins - 1), F.floor(s * n_bins)).cast("int").alias("bin"),
        s.alias("_s"),
        y.alias("_y"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("_s").alias("_ms"),
        F.avg("_y").alias("_pr"),
        F.sum((F.col("_s") - F.col("_y")) * (F.col("_s") - F.col("_y"))).alias("_sqerr"),
    )
    tot = per_bin.agg(
        F.sum("n").alias("_n_tot"),
        F.sum(F.col("n") * F.abs(F.col("_ms") - F.col("_pr"))).alias("_gap_w"),
        F.sum("_sqerr").alias("_sq_tot"),
    )
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            F.round("_ms", round_to).alias("mean_score"),
            F.round("_pr", round_to).alias("positive_rate"),
            F.round(F.abs(F.col("_ms") - F.col("_pr")), round_to).alias("abs_gap"),
            F.round(F.col("_gap_w") / F.col("_n_tot"), round_to).alias("ece"),
            F.round(F.col("_sq_tot") / F.col("_n_tot"), round_to).alias("brier"),
        )
    )
