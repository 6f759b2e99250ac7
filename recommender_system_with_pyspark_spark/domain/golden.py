"""Reference-scale synthetic BGG ratings — the golden-metric harness.

The reference's behavioral truth is `risultati.txt:140-144`: ALS over the
cleaned BGG ratings (~18.9M rows into the TVS grid, `risultati.txt:173`)
reaches test RMSE 1.1024 / R^2 0.4225, best params rank=20 / regParam=0.1,
in 49.8 min wall-clock for the 4-fit grid. The raw BGG dump is not in this
container, so parity is measured on a SYNTHETIC corpus calibrated to the
same variance structure:

    R^2  = 1 - RMSE^2 / Var(rating)
    0.4225 = 1 - 1.1024^2 / Var  =>  Var = 2.104  (std 1.4506)

Ratings are drawn from a bias + low-rank latent-factor model plus noise:

    r(u,i) = mu + b_u + b_i + (signal_std / sqrt(true_rank)) * <p_u, q_i>
             + noise_std * e

with b_u, b_i, p_u, q_i, e standard normal (scaled by their stds). The
bias/interaction split mirrors what real rating data looks like: most of
the explainable variance is per-user and per-item offsets, which ALS
recovers almost fully (each pools ~47 observations), while the rank-r
interaction is only partially recoverable at this density — measured at
~30% with regParam 0.1 (MLlib scales lambda by per-entity rating counts,
ALS-WR style). A pure-interaction corpus calibrated to the same totals
stalls at RMSE 1.30 / R^2 0.19 — the bias structure is what makes the
reference's 1.1024/0.4225 reachable. CALIB_* holds the calibrated values.

Everything is DETERMINISTIC AND PARTITIONING-INDEPENDENT: every random
draw is a pure function of (entity id, tag, seed) via xxhash64 -> uniform
-> Box-Muller, evaluated inside whole-stage codegen. No F.rand/F.randn
(those depend on task partitioning), no shuffle, no Python. The same
(n, seed) yields the identical corpus on any cluster layout — the property
that makes golden assertions meaningful.

Scale notes: generation is a single embarrassingly-parallel projection over
``spark.range(n)`` — at 100 TB-equivalent row counts it saturates CPU, not
network. Per-row cost is ~2*true_rank+1 Box-Muller draws (hash + log +
sqrt + cos each), all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Calibrated so that `als_prediction` (rank 20, regParam 0.1, maxIter 20,
# seed 1, 80/20 split) on the BGG-shaped corpus lands on the reference's
# RMSE 1.1024 / R^2 0.4225 (risultati.txt:140-144). Constraints: total var
# = 2.104; ALS-explained var = 0.889. Biases contribute var_u + var_i
# fully; the interaction ~30% at this density; noise + unrecovered
# interaction + estimation error make up rmse^2 = 1.2153. Measured at the
# calibration shape (2M ratings, 42k users, 2.3k items — reference per-user
# density): RMSE 1.0981 / R^2 0.4246.
CALIB_MU = 7.0
CALIB_TRUE_RANK = 4
CALIB_BIAS_U_STD = 0.6364  # var 0.405
CALIB_BIAS_I_STD = 0.6364  # var 0.405
CALIB_SIGNAL_STD = 0.5477  # interaction var 0.30, ~30% recoverable (measured)
CALIB_NOISE_STD = 0.9789

# Reference corpus shape: the raw BGG dump is ~18.9M ratings from ~411k
# users (risultati.txt:42 — the logreg user one-hot dim is 411,373) over
# ~22k games; als.py:14-15 prunes games <1000 ratings and users <10.
REF_N_RATINGS = 18_900_000
REF_N_USERS = 411_000
REF_N_ITEMS = 22_000
# BGG-like popularity: 72% of rating mass uniform over the 3000 head games
# (each ≈4.5k ratings — comfortably over the prune threshold), 28% u^2-skewed
# over the full catalog. Post-prune this keeps ~82% of rows on exactly the
# head games — the shape that makes min_game_ratings=1000 meaningful.
REF_HEAD_FRAC = 0.72
REF_HEAD_ITEMS = 3_000


_M = 1 << 31


def _uniform(*cols: Column | str | int) -> Column:
    """Deterministic uniform in (0,1): xxhash64 of the inputs, folded into
    [0, 2^31) and shifted off the endpoints (Box-Muller needs u > 0)."""
    h = F.xxhash64(*[F.lit(c) if isinstance(c, (str, int)) else c for c in cols])
    return (F.pmod(h, F.lit(_M)).cast("double") + F.lit(0.5)) / F.lit(float(_M))


def _gauss(*cols: Column | str | int) -> Column:
    """Standard normal via Box-Muller over two independent hash-uniforms."""
    u1 = _uniform(*cols, 1)
    u2 = _uniform(*cols, 2)
    return F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(6.283185307179586) * u2)


def synthetic_ratings(
    spark: SparkSession,
    n_ratings: int,
    n_users: int,
    n_items: int,
    true_rank: int = CALIB_TRUE_RANK,
    signal_std: float = CALIB_SIGNAL_STD,
    noise_std: float = CALIB_NOISE_STD,
    bias_u_std: float = CALIB_BIAS_U_STD,
    bias_i_std: float = CALIB_BIAS_I_STD,
    mu: float = CALIB_MU,
    item_skew: float = 1.4,
    head_frac: float | None = None,
    head_items: int | None = None,
    seed: int = 1,
    partitions: int | None = None,
) -> DataFrame:
    """(user_id int, item_id int, rating double) from the latent model.

    ``item_skew`` beta-warps item popularity (item = floor(n_items *
    u^beta)): beta>1 concentrates ratings on low item ids the way BGG
    ratings concentrate on popular games, so the reference's
    min_game_ratings=1000 prune (als.py:14) has real work to do. With
    ``head_frac``/``head_items`` set, that fraction of ratings is instead
    drawn uniformly from the ``head_items`` most popular games (heavy-head
    mixture — the realistic BGG shape where a few thousand games carry most
    of the rating mass). Ratings are rounded to 0.1 steps like the E1
    cleaning (datacleaning.py:15-20).
    """
    rows = spark.range(0, n_ratings, numPartitions=partitions)
    rid = F.col("id")
    user = F.pmod(F.xxhash64(rid, F.lit("u"), F.lit(seed)), F.lit(n_users)).cast("int")
    tail_item = F.least(
        F.floor(F.lit(float(n_items)) * F.pow(_uniform(rid, "i", seed), F.lit(item_skew))),
        F.lit(n_items - 1),
    ).cast("int")
    if head_frac is not None and head_items is not None:
        head_item = F.pmod(F.xxhash64(rid, F.lit("hi"), F.lit(seed)), F.lit(head_items)).cast("int")
        item = F.when(_uniform(rid, "h", seed) < F.lit(head_frac), head_item).otherwise(tail_item)
    else:
        item = tail_item
    df = rows.select(user.alias("user_id"), item.alias("item_id"))
    dot = None
    for k in range(true_rank):
        term = _gauss(F.col("user_id"), "p", k, seed) * _gauss(F.col("item_id"), "q", k, seed)
        dot = term if dot is None else dot + term
    rating = (
        F.lit(mu)
        + F.lit(bias_u_std) * _gauss(F.col("user_id"), "bu", seed)
        + F.lit(bias_i_std) * _gauss(F.col("item_id"), "bi", seed)
        + F.lit(signal_std / float(true_rank) ** 0.5) * dot
        + F.lit(noise_std) * _gauss(F.col("user_id"), F.col("item_id"), "n", seed)
    )
    return df.withColumn("rating", F.round(rating, 1))


def synthetic_bgg_corpus(
    spark: SparkSession,
    n_ratings: int = REF_N_RATINGS,
    n_users: int = REF_N_USERS,
    n_items: int = REF_N_ITEMS,
    **kwargs,
) -> tuple[DataFrame, DataFrame]:
    """(ratings, games) shaped like the reference's E2 inputs: ratings carry
    a string ``Username`` (so StringIndexer does reference-shaped work) and
    ``BGGId``/``Rating``; games carries (BGGId, Name)."""
    kwargs.setdefault("head_frac", REF_HEAD_FRAC)
    kwargs.setdefault("head_items", REF_HEAD_ITEMS)
    r = synthetic_ratings(spark, n_ratings, n_users, n_items, **kwargs)
    ratings = r.select(
        F.format_string("user_%07d", F.col("user_id")).alias("Username"),
        F.col("item_id").alias("BGGId"),
        F.col("rating").alias("Rating"),
    )
    games = spark.range(n_items).select(
        F.col("id").cast("int").alias("BGGId"),
        F.format_string("Game %05d", F.col("id")).alias("Name"),
    )
    return ratings, games
