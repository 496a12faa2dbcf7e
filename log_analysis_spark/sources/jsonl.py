"""JSONL document interchange + attribute sidecars (Dolma-style).

The de-facto exchange format for LLM training corpora (AI2's Dolma
toolkit, RedPajama, FineWeb releases — public specs) is gzipped JSONL:
one document object per line (``id``, ``text``, ``source``, optional
metadata), with *attribute sidecar* files carrying per-document tagger
outputs (quality scores, PII spans, dedup flags) keyed by ``id`` — the
"tag, then filter" contract: taggers never rewrite the corpus, the mixer
applies rules by joining sidecars.

Spark-first shape:

* reads use an EXPLICIT schema (``spark.read.schema(...).json`` — never
  schema inference, which would cost a full extra pass over 100 TB) and
  PERMISSIVE mode with a corrupt-record capture column, so one broken
  line dead-letters instead of killing a 1000-executor stage.
* ``.gz`` decode rides Spark's codec layer (same as the Zeek TSV path);
  at scale, prefer many medium files over few giant ones — gzip is not
  splittable, one file = one task (documented cap, identical to WARC).
* the sidecar apply is ONE equi-join by id (broadcastable when the
  attribute relation is small after filtering), and span removal is a
  native sorted left fold over the span array — byte-exact reassembly,
  zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Document line schema (the Dolma core fields this engine exchanges).
DOC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("start", T.LongType()),
            T.StructField("end", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
)


def write_docs_jsonl(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    compression: str = "gzip",
    partition_by: str | None = None,
) -> None:
    """Write a documents relation as Dolma-style JSONL (one object per
    line; ``id`` is always a string per the spec). ``partition_by``
    yields the release layout (one subdirectory per split/shard)."""
    cols = [F.col(id_col).cast("string").alias("id")]
    for c in ("text", "source", "lang"):
        if c in docs.columns:
            cols.append(F.col(c))
    if partition_by is not None:
        cols.append(F.col(partition_by))
    w = docs.select(*cols).write.mode("overwrite").option(
        "compression", compression
    )
    if partition_by is not None:
        w = w.partitionBy(partition_by)
    w.json(path)


def read_docs_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read Dolma-style JSONL with the explicit schema; malformed lines
    land with ``_corrupt`` set and every real field NULL (dead-letter
    rows — filter ``_corrupt IS NULL`` for the clean relation)."""
    return (
        spark.read.schema(DOC_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def write_attributes(
    attrs: DataFrame,
    path: str,
    id_col: str = "id",
    compression: str = "gzip",
) -> None:
    """Write an attribute sidecar: ``{"id": ..., "attributes": {...}}``
    with every non-id column nested under ``attributes`` (the Dolma
    sidecar layout — taggers add columns, the corpus file never moves)."""
    attr_cols = [c for c in attrs.columns if c != id_col]
    attrs.select(
        F.col(id_col).cast("string").alias("id"),
        F.struct(*[F.col(c) for c in attr_cols]).alias("attributes"),
    ).write.mode("overwrite").option("compression", compression).json(path)


def read_attributes(
    spark: SparkSession, path: str, attr_schema: T.StructType
) -> DataFrame:
    """Read an attribute sidecar back to a flat (id, attr...) relation.
    ``attr_schema`` types the ``attributes`` struct explicitly (no
    inference pass)."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("attributes", attr_schema),
        ]
    )
    df = spark.read.schema(schema).json(path)
    return df.select("id", *[F.col(f"attributes.{f.name}") for f in attr_schema])


def apply_attribute_filter(
    docs: DataFrame,
    attrs: DataFrame,
    predicate: Column,
    id_col: str = "id",
) -> DataFrame:
    """The mixer move: join the sidecar by id, keep docs where
    ``predicate`` (an expression over attribute columns) holds. One
    equi-join; the document text column is never rewritten."""
    return docs.join(attrs, on=id_col, how="inner").filter(predicate)


def remove_spans(text: Column, spans: Column) -> Column:
    """Cut character ranges [start, end) out of ``text`` — the span-attribute
    scrub (PII, boilerplate, contaminated windows) as ONE native sorted
    left fold: spans are sorted by start, the fold carries (cursor, out)
    and appends the gap before each span, overlapping/nested spans merge
    via the running cursor max. Byte-exact reassembly, no Python, and the
    identical fold replays in DuckDB's list_reduce for the oracle.

    1-based ``substring`` indexing; span offsets are 0-based
    [start, end) like Dolma's."""
    sorted_spans = F.array_sort(spans)
    folded = F.aggregate(
        sorted_spans,
        F.struct(
            F.lit(0).cast("long").alias("cur"),
            F.lit("").alias("out"),
        ),
        lambda acc, s: F.struct(
            F.greatest(acc["cur"], s["end"]).alias("cur"),
            F.when(
                s["start"] > acc["cur"],
                F.concat(
                    acc["out"],
                    F.substring(
                        text,
                        (acc["cur"] + 1).cast("int"),
                        (s["start"] - acc["cur"]).cast("int"),
                    ),
                ),
            )
            .otherwise(acc["out"])
            .alias("out"),
        ),
    )
    return F.concat(
        folded["out"],
        F.substring(
            text,
            (folded["cur"] + 1).cast("int"),
            F.greatest(
                F.length(text) - folded["cur"], F.lit(0).cast("long")
            ).cast("int"),
        ),
    )
