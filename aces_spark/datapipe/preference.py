"""Pairwise-preference aggregation — Bradley-Terry strength fitting over
a comparisons table, the reward-model / RLHF data-curation step that
turns raw A-beat-B judgments into per-item quality scores.

Model (Bradley & Terry 1952): P(i beats j) = w_i / (w_i + w_j). Fitting
uses the MM algorithm (Hunter 2004, "MM algorithms for generalized
Bradley-Terry models"):

    w_i  <-  W_i / sum_j n_ij / (w_i + w_j)

where ``W_i`` is i's total wins and ``n_ij`` the games played between i
and j. Each iteration is one join of the (Zipf-small) pair-count table
against the current weight vector plus one per-player aggregate — the
corpus of raw judgments is touched ONCE (two hash aggregates to build
``n_ij`` and ``W_i``); iterations never re-read it.

Determinism discipline (the same integer fixed-point contract as
``functions.features.train_linear_classifier`` and ``datapipe.lm``):
weights live in micro-units (int64), every division is a truncating
integer ``div`` (DuckDB ``//`` agrees for the non-negative operands
used here), and sums accumulate in DECIMAL(38,0) — so a fixed iteration
count yields bit-identical weights at any partition count and across
engines, which is what makes the unrolled SQL differential oracle
possible.

Scale shape: players are items being ranked (prompts, models, sources)
— the weight vector is small by construction; AQE broadcasts it into
the pair join. The one corpus-sized step is the initial aggregation,
keyed by the (winner, loser) pair: uniform, map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bradley_terry_scores"]

SCALE = 1_000_000  # micro-units
_DEC = "decimal(38,0)"


def bradley_terry_scores(
    comparisons: DataFrame,
    n_iters: int = 3,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> DataFrame:
    """Fit Bradley-Terry strengths with ``n_iters`` MM iterations.

    ``comparisons``: one row per judgment (or pre-aggregated with a
    repeat row per game) with ``winner_col`` / ``loser_col`` naming the
    two players. Output: ``(player, strength_micro, wins, games)``,
    strengths normalized so they sum to ``n_players * 1e6`` (the
    all-equal prior is exactly 1e6 each).

    Players with zero wins keep strength floor 1 (micro) rather than
    collapsing the division; players appearing only as winners of
    walkovers against themselves are rejected by the self-pair check.
    """
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    raw = comparisons.select(
        F.col(winner_col).cast("string").alias("winner"),
        F.col(loser_col).cast("string").alias("loser"),
    )
    # corpus pass 1: directed win counts (also yields n_ij and W_i)
    directed = (
        raw.filter(F.col("winner") != F.col("loser"))
        .groupBy("winner", "loser")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    directed = directed.localCheckpoint(eager=True)  # truncate: feeds 3 relations

    # undirected games per unordered pair, materialized symmetrically:
    # one row (i, j, n_ij) for EVERY ordered (i, j) with games between
    # them, so the per-i denominator is a plain group-by
    sym = directed.select(
        F.col("winner").alias("i"), F.col("loser").alias("j"), "n"
    ).unionByName(
        directed.select(
            F.col("loser").alias("i"), F.col("winner").alias("j"), "n"
        )
    )
    games = sym.groupBy("i", "j").agg(F.sum("n").cast("long").alias("n_ij"))
    # games feeds every iteration and players feeds wins/totals/w0:
    # truncate both (Zipf-small relations) so no branch replays the
    # corpus aggregation
    games = games.localCheckpoint(eager=True)

    players = games.select(F.col("i").alias("player")).distinct()
    players = players.localCheckpoint(eager=True)
    wins = players.join(
        directed.groupBy("winner").agg(F.sum("n").cast("long").alias("wins")),
        players.player == F.col("winner"),
        "left",
    ).select("player", F.coalesce("wins", F.lit(0)).cast("long").alias("wins"))
    totals = players.join(
        games.groupBy("i").agg(F.sum("n_ij").cast("long").alias("games")),
        players.player == F.col("i"),
        "left",
    ).select("player", F.coalesce("games", F.lit(0)).cast("long").alias("games"))
    # wins is re-joined every iteration: truncate it too
    wins = wins.localCheckpoint(eager=True)

    n_players = players.count()  # sanctioned scalar: sizes the normalizer
    target_sum = int(n_players) * SCALE

    w = players.select("player", F.lit(SCALE).cast("long").alias("u"))
    for _ in range(n_iters):
        ui = w.select(F.col("player").alias("i"), F.col("u").alias("u_i"))
        uj = w.select(F.col("player").alias("j"), F.col("u").alias("u_j"))
        # t_ij = n_ij * SCALE^2 div (u_i + u_j): integer, exact
        t = (
            games.join(ui, "i")
            .join(uj, "j")
            .select(
                "i",
                F.expr(
                    f"cast(n_ij as {_DEC}) * {SCALE} * {SCALE}"
                    f" div (cast(u_i as {_DEC}) + cast(u_j as {_DEC}))"
                ).alias("t"),
            )
        )
        denom = t.groupBy("i").agg(F.sum("t").cast(_DEC).alias("denom"))
        upd = (
            wins.join(denom, wins.player == denom.i, "left")
            .select(
                "player",
                F.expr(
                    f"cast(wins as {_DEC}) * {SCALE} * {SCALE}"
                    f" div greatest(denom, cast(1 as {_DEC}))"
                ).alias("u_raw"),
            )
        )
        # normalize so sum(u) == n_players * SCALE, floor 1
        s = upd.agg(F.sum("u_raw").cast(_DEC).alias("s_all"))
        w = (
            upd.crossJoin(F.broadcast(s))
            .select(
                "player",
                F.greatest(
                    F.expr(
                        f"cast(u_raw * {target_sum} div"
                        f" greatest(s_all, cast(1 as {_DEC})) as long)"
                    ),
                    F.lit(1).cast("long"),
                ).alias("u"),
            )
        )
        w = w.localCheckpoint(eager=False)  # truncate the growing lineage

    return (
        w.join(wins, "player")
        .join(totals, "player")
        .select(
            "player",
            F.col("u").alias("strength_micro"),
            "wins",
            "games",
        )
    )
