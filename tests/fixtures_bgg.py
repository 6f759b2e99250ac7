"""Deterministic BGG-shaped fixture generator (FIXTURES.md T1-T3).

Seeded; reproduces the properties the pipeline must exercise: long-tail
skew, nulls, sentinels, outliers, zero-variance columns, sparse flag
matrices."""

from __future__ import annotations

import random

N_GAMES = 100
N_USERS = 200
N_RATINGS = 5000

THEMES = [f"Theme{i}" for i in range(12)]
MECHANICS = [f"Mech{i}" for i in range(15)]
FAMILIES = ["FamA", "FamB", "FamC"]


def make_user_ratings(seed: int = 42):
    rng = random.Random(seed)
    rows = []
    for i in range(N_RATINGS):
        # zipf-ish skew: low game/user ids get most ratings
        game = min(int(rng.paretovariate(1.2)), N_GAMES) - 1 + 1
        user = min(int(rng.paretovariate(1.1)), N_USERS)
        rating = round(min(10.0, max(0.0, rng.gauss(7.0, 1.8))), 2)
        rows.append((game, rating, f"user_{user}"))
    # a few rows with nulls (PDF p.7: 63 of 19M)
    rows[10] = (None, 5.0, "user_1")
    rows[20] = (3, None, "user_2")
    rows[30] = (4, 6.0, None)
    return rows, "BGGId int, Rating double, Username string"


def make_games(seed: int = 43):
    rng = random.Random(seed)
    rows = []
    for gid in range(1, N_GAMES + 1):
        year = rng.choice([0, 1960] + [rng.randint(1975, 2022)] * 18)  # some ≤0 / ≤1970
        rows.append(
            (
                gid,
                f"Game {gid}",
                "desc " * 5,
                year,
                round(rng.uniform(1, 5), 2),
                round(rng.uniform(1, 10), 2),
                round(rng.uniform(5, 8.5), 2),
                rng.choice([0] + [rng.randint(1, 8)] * 9),   # MinPlayers, ~10% 0s
                rng.randint(2, 10),                          # MaxPlayers
                rng.choice([None, round(rng.uniform(6, 16), 1)]),   # ComAgeRec nulls
                rng.choice([None, round(rng.uniform(1, 5), 1)]),    # LanguageEase nulls
                rng.choice([0, rng.randint(2, 6)]),          # BestPlayers sentinel 0
                rng.choice(["[]", f"[{rng.randint(2,5)}]"]),  # GoodPlayers sentinel '[]'
                int(rng.paretovariate(1.0) * 100),            # NumOwned heavy tail
                rng.randint(0, 500),                          # NumWant
                0,                                            # NumComments all-zero
                rng.choice([0] + [rng.randint(30, 240)] * 9), # MfgPlaytime, ~10% 0s
                rng.choice([0] + [rng.randint(30, 240)] * 9), # ComMinPlaytime
                rng.choice([0] + [rng.randint(30, 300)] * 9), # ComMaxPlaytime
                rng.choice([0] + [rng.randint(6, 16)] * 9),   # MfgAgeRec, ~10% 0s
                rng.choice([None, None, rng.choice(FAMILIES)]),  # Family ~66% null
                rng.randint(0, 1),                            # Kickstarted
                float(rng.randint(1, 5000)),                  # Rank:boardgame
                7.0,                                          # Rank:strategygames ~constant
                rng.randint(0, 1),                            # IsReimplementation
            )
        )
    schema = (
        "BGGId int, Name string, Description string, YearPublished int, "
        "GameWeight double, AvgRating double, BayesAvgRating double, "
        "MinPlayers int, MaxPlayers int, ComAgeRec double, LanguageEase double, "
        "BestPlayers int, GoodPlayers string, NumOwned int, NumWant int, "
        "NumComments int, MfgPlaytime int, ComMinPlaytime int, ComMaxPlaytime int, "
        "MfgAgeRec int, Family string, Kickstarted int, `Rank:boardgame` double, "
        "`Rank:strategygames` double, IsReimplementation int"
    )
    return rows, schema


def make_flag_matrix(names: list[str], seed: int):
    rng = random.Random(seed)
    rows = []
    for gid in range(1, N_GAMES + 1):
        n_set = rng.choice([0, 1, 1, 2, 3])  # some all-zero rows
        chosen = set(rng.sample(range(len(names)), n_set))
        rows.append((gid, *[1 if i in chosen else 0 for i in range(len(names))]))
    schema = "BGGId int, " + ", ".join(f"`{n}` int" for n in names)
    return rows, schema


def build_all(spark):
    r, rs = make_user_ratings()
    g, gs = make_games()
    t, ts = make_flag_matrix(THEMES, 44)
    m, ms = make_flag_matrix(MECHANICS, 45)
    return {
        "user_ratings": spark.createDataFrame(r, rs),
        "games": spark.createDataFrame(g, gs),
        "themes": spark.createDataFrame(t, ts),
        "mechanics": spark.createDataFrame(m, ms),
    }
