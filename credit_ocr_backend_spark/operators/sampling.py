"""Deterministic corpus sampling and training-shard assignment.

Training-data pipelines need REPRODUCIBLE sampling: re-running the job
on the same snapshot must pick exactly the same documents (so ablations
compare like with like, and a resumed run doesn't re-roll the dice).
Spark's ``df.sample`` is seed-stable only for a fixed partitioning —
any upstream change reshuffles the choice. These operators derive the
sampling decision from a content key instead (md5, the engine-wide
cross-engine hash), so the decision is a pure function of the row:
identical in Spark and DuckDB, stable under any repartitioning, and
trivially auditable.

Scale notes:
* sampling is a stateless filter — pushes to the scan, no shuffle;
* ``token_shards`` deliberately assigns shards WITHIN hash buckets:
  a global cumulative sum would be a single-partition window (the
  classic scale-killer); per-bucket cumsum keeps the window partitioned
  while still packing every shard to ~budget tokens. Shard identity is
  (bucket, shard_in_bucket) — at 10^12 docs each bucket's window sorts
  only its own slice.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# md5-hex prefix of 8 nibbles → uniform integer in [0, 2^32)
_HASH_SPAN = float(1 << 32)


def _md5_long(prefix: str, key: Column) -> Column:
    """First 8 md5-hex nibbles of ``prefix || key`` as a uniform long in
    [0, 2^32) — the one cross-engine hash primitive every sampling
    decision derives from. Any change here MUST be mirrored in the
    DuckDB oracle form ``CAST('0x'||substr(md5(prefix||key),1,8) AS
    BIGINT)``; keeping a single copy is what keeps the mirrors in
    lockstep."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def uniform_unit(key: Column, seed: str = "s0") -> Column:
    """Deterministic uniform [0,1) from a key column — md5-based, so
    DuckDB reproduces it bit-for-bit:
    ``CAST('0x'||substr(md5(seed||':'||key),1,8) AS BIGINT)/2^32``."""
    return _md5_long(f"{seed}:", key) / F.lit(_HASH_SPAN)


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str, seed: str = "s0"
) -> DataFrame:
    """Keep ~rate of rows, chosen by content key (not partition RNG):
    stable under repartition, resume, and engine swap."""
    return df.where(uniform_unit(F.col(key_col), seed) < rate)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: Dict[str, float],
    key_col: str,
    seed: str = "s0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    keep 100% of low-resource languages, 10% of English). The rate
    lookup compiles to a when-chain — whole-stage codegen, no join."""
    chain: Column = F.lit(default_rate)
    for value, rate in sorted(rates.items()):
        chain = F.when(F.col(stratum_col) == value, F.lit(rate)).otherwise(chain)
    return df.where(uniform_unit(F.col(key_col), seed) < chain)


def token_shards(
    df: DataFrame,
    token_col: str,
    budget: int,
    key_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign each document to a training shard of ~``budget`` tokens.

    Documents are hashed into ``n_buckets`` deterministic buckets
    (md5-based, cross-engine), ordered by key within their bucket, and
    cut greedily by cumulative token count: shard boundary where the
    RUNNING total (inclusive) first exceeds a multiple of budget —
    i.e. ``shard = floor((cumsum - tokens) / budget)``, the exclusive
    prefix sum, so a shard is closed by the document that overflows it.

    Output adds (bucket, shard, shard_tokens_before). Shard identity is
    the PAIR (bucket, shard): per-bucket windows keep the sort
    partitioned — a single global cumsum window would serialize the
    whole corpus through one partition."""
    bucket = F.pmod(_md5_long("shard:", F.col(key_col)), F.lit(n_buckets)).cast("int")
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("bucket", bucket).withColumn(
        "_cum", F.sum(F.col(token_col)).over(w)
    )
    return out.select(
        "*",
        F.floor((F.col("_cum") - F.col(token_col)) / budget).cast("int").alias("shard"),
        (F.col("_cum") - F.col(token_col)).alias("shard_tokens_before"),
    ).drop("_cum")
