"""Relational + spatial operators, all expressed as DataFrame plans."""

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: float = 0.5) -> DataFrame:
    """Repartition iff the input is under-partitioned for the cluster.

    Python-kernel operators (MinHash, SimHash, S2, media decode) are
    CPU-bound per Arrow batch: a small parquet input arriving as 1-2
    splits would pin the whole stage to 1-2 cores. A round-robin
    repartition to the default parallelism costs one cheap shuffle of the
    raw rows and unlocks the full cluster. No-op when the source is
    already well-partitioned (the usual case at scale).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target * min_factor:
        return df.repartition(target)
    return df
