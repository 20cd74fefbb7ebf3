"""Skew mitigation for hot-key joins.

AQE's skew-join splitting (on by default in the engine session) handles
sort-merge skew at runtime; ``salted_join`` is the explicit variant for
the cases AQE can't fix — e.g. a hot key joined against a non-broadcastable
dimension, or deterministic partitioning requirements.

Mechanics: the fact side gets a uniform random salt in [0, n_salts); the
dimension side is replicated n_salts times with every salt value; the
join key becomes (key, salt), splitting each hot key's rows across
n_salts tasks.  Join semantics (inner/left) are preserved exactly —
each fact row still meets each matching dim row exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``on`` with an n-way salt split of
    every key.  ``dim`` is replicated n_salts× (keep it far smaller than
    the fact side; for tiny dims prefer a plain broadcast join).

    Only ``inner`` and fact-preserving left joins are valid: the dim
    replication makes right/full outer joins surface every unmatched dim
    row n_salts times, and left_anti/left_semi against the replicated
    side change multiplicity semantics — reject those instead of
    returning plausible-looking garbage."""
    ok = {"inner", "left", "left_outer", "leftouter"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in ok}:
        raise ValueError(
            f"salted_join preserves semantics only for {sorted(ok)} joins, got {how!r}: "
            "the salt-replicated dim side would multiply unmatched/anti rows"
        )
    salted_fact = fact.withColumn("_salt", (F.rand(seed) * n_salts).cast("int"))
    salts = fact.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    salted_dim = dim.crossJoin(salts)
    out = salted_fact.join(salted_dim, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def estimate_max_group_rows(
    df: DataFrame,
    group_cols: list[str],
    salt_cols: list[str],
    probe_mod: int = 64,
) -> int:
    """Cheap skew pre-probe: a deterministic 1/probe_mod row sample
    (xxhash64 of ``salt_cols``), partial-aggregated per group; the
    estimated largest group is max(sample count) * probe_mod.  One
    small job — the sample filter runs before the per-group shuffle,
    so the probe moves ~1/probe_mod of the rows."""
    sample = (
        df.select(*group_cols, *[
            c for c in salt_cols if c not in group_cols])
        .filter(F.pmod(F.xxhash64(*salt_cols), F.lit(probe_mod)) == 0)
        .groupBy(*group_cols)
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()
    )
    mx = sample[0]["mx"] if sample and sample[0]["mx"] is not None \
        else 0
    return mx * probe_mod


def group_top_k(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    salt_cols: list[str],
    k: int,
    n_salts: int = 32,
    rank_col: str = "_rank",
    min_salt_group_rows: int | None = 100_000,
    probe_df: DataFrame | None = None,
) -> DataFrame:
    """Skew-safe deterministic per-group top-k: a two-phase group
    limit that a mega-group cannot serialize into one window task.

    Phase 1 ranks within (group, salt) — the salt is ``xxhash64`` of
    ``salt_cols`` (columns that must make ``order_cols`` a TOTAL
    order, e.g. the tiebreak ids), so the hot group's rows spread
    over ``n_salts`` parallel tasks and only k survivors per bucket
    continue.  Phase 2 re-ranks the <= k * n_salts survivors per
    group with the SAME ordering, yielding ranks identical to a
    single ``row_number`` window (the group top-k is always contained
    in the union of the bucket top-ks).

    Cost: one extra (narrow-ish) shuffle keyed (group, salt), after
    which the group-keyed shuffle carries at most k * n_salts rows
    per group instead of the full group.  At 100 TB a 90 %%-hot host
    costs ~1/n_salts of the single-window wall-clock.

    The two-phase plan has a ~2.6x constant on BALANCED data, so by
    default a skew pre-probe (``estimate_max_group_rows``, one small
    sampled job at plan-build time) picks the plan: when no group is
    estimated above ``min_salt_group_rows`` rows, a single-window
    plan runs — a window task over <100k rows is cheap, and the
    probe keeps the salted plan for exactly the inputs that need it.
    Pass ``min_salt_group_rows=None`` to force the two-phase plan
    unconditionally (no probe job).  ``probe_df`` substitutes a
    CHEAPER upstream relation for the probe (it must contain
    group_cols + salt_cols and a superset of df's group sizes —
    e.g. the pre-join URL parse for a frontier quota): probing df
    itself would re-execute the full upstream, eating the saving."""
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError("group_top_k needs k >= 1")
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    if min_salt_group_rows is not None:
        est = estimate_max_group_rows(
            probe_df if probe_df is not None else df,
            group_cols, salt_cols)
        if est <= min_salt_group_rows:
            return (
                df.withColumn(rank_col, F.row_number().over(w2))
                .filter(F.col(rank_col) <= k)
            )
    salt = F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts))
    w1 = Window.partitionBy(*group_cols, "_gtk_salt").orderBy(*order_cols)
    return (
        df.withColumn("_gtk_salt", salt)
        .withColumn("_gtk_r1", F.row_number().over(w1))
        .filter(F.col("_gtk_r1") <= k)
        .withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
        .drop("_gtk_salt", "_gtk_r1")
    )
