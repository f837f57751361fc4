"""JSONL (newline-delimited JSON) corpus connector.

The interchange format of web-text curation: Common-Crawl derivatives,
RedPajama/C4-style dumps, and most released corpora ship as
``*.jsonl[.gz]`` with one document object per line. Spark's JSON source
handles this natively (splittable when uncompressed, per-file parallel
when gzipped), so the connector's job is the *contract*, not the
parsing: a pinned schema (schema inference at 100 TB means reading the
data twice — never), PERMISSIVE corrupt-line capture so one mangled
line doesn't kill a 10^12-doc ingest, and a writer that round-trips.

Reference role: the reference ingests feature tables from its warehouse
(/root/reference/modeling/datasets/build.py fetch path); this is the
engine's equivalent boundary for text corpora arriving as files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# the documents-table contract (TESTDATA.md) as the default wire schema
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOC_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a JSONL dump with a pinned schema.

    Corrupt lines never fail the job. Default: DROPMALFORMED — bad lines
    vanish at parse time, nothing extra is materialized (the 100 TB
    posture). CAVEAT: the drop is projection-dependent — a query that
    prunes every column (``df.count()``) lets Spark skip full parsing
    and can count malformed lines, disagreeing with any query that
    reads real columns. For ingest bookkeeping, count a materialized
    column (``df.where(col(id).isNotNull()).count()``) or the written
    output, never the bare source. ``keep_corrupt=True``: PERMISSIVE with the raw line
    captured in ``_corrupt_record`` (schema fields null on those rows)
    for quarantine/debugging. Spark disallows queries that reference
    ONLY the corrupt column straight off the source
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize or cache first if
    you need to inspect just the bad lines.
    """
    if keep_corrupt:
        # copy — StructType.add mutates in place, which would poison the
        # module-level DOC_SCHEMA (and any caller-supplied schema)
        full = T.StructType(
            [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
        )
        return (
            spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)


def write_jsonl(df: DataFrame, path: str, compress: bool = True) -> None:
    """Write a corpus as gzipped JSONL (one object per line, per-part
    files — the shape every downstream tokenizer/trainer expects)."""
    w = df.write.mode("overwrite")
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)
