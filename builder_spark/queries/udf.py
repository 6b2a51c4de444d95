"""UDF surface + sinks — SURVEY.md §2.B rows 65-70.

These queries exist to prove the UDF machinery itself (row UDF, Arrow
pandas UDF, grouped-agg UDF, grouped-map applyInPandas, Python UDTF,
and the parquet sink roundtrip). Everywhere ELSE in this engine the
same logic would be a built-in expression — UDFs are the slow path
(row UDFs serialize per row; pandas UDFs amortize via Arrow batches,
~10-100× better; built-ins stay in codegen entirely).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from builder_spark.catalog import load_table
from builder_spark.registry import register
from builder_spark.scratch import scratch_dir


@register(
    "q_udf_scalar",
    oracle="""
        SELECT c_custkey, reverse(replace(lower(c_name), ' ', '-')) AS normalized
        FROM customer
    """,
    category="udf",
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (deliberately — this op demonstrates the
    slow path; the oracle shows it is trivially SQL-expressible)."""

    @F.udf("string")
    def normalize(s: str) -> str:
        return s.lower().replace(" ", "-")[::-1] if s is not None else None

    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", normalize("c_name").alias("normalized"))


@register(
    "q_pandas_udf",
    oracle="""
        SELECT event_id, round(value * 2 + 1, 4) AS scored
        FROM events
    """,
    category="udf",
)
def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF — Arrow batches, NumPy arithmetic."""

    @pandas_udf("double")
    def score(v: pd.Series) -> pd.Series:
        return (v * 2 + 1).round(4)

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", score("value").alias("scored"))


@register(
    "q_grouped_agg_udf",
    oracle="""
        SELECT o_orderpriority, round(exp(avg(ln(o_totalprice))), 4) AS geo_mean
        FROM orders
        GROUP BY o_orderpriority
    """,
    category="udf",
)
def q_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: geometric mean per priority
    (exp∘mean∘log — SQL-expressible, so the oracle can check it)."""
    import numpy as np

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.round(np.exp(np.log(v.to_numpy()).mean()), 4))

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(geo_mean("o_totalprice").alias("geo_mean"))


@register(
    "q_apply_in_pandas",
    oracle="""
        SELECT event_id, user_id,
               round(coalesce(
                   (value - avg(value) OVER (PARTITION BY user_id))
                   / nullif(stddev_samp(value) OVER (PARTITION BY user_id), 0),
                   0.0), 4) AS z
        FROM events
    """,
    category="udf",
)
def q_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user z-score normalization. Each
    user's rows arrive as one pandas DataFrame (Arrow). Degenerate
    groups (stddev 0 or undefined) normalize to 0 on both sides."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["value"].std(ddof=1)
        mu = pdf["value"].mean()
        if pd.isna(sd) or sd == 0:
            z = pd.Series(0.0, index=pdf.index)
        else:
            z = (pdf["value"] - mu) / sd
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "z": z.round(4)}
        )

    ev = load_table(spark, sf_dir, "events")
    # pinned (user_id) exchange: the implicit grouped-map exchange is
    # byte-tiny, so AQE coalesced the per-user Python stage to a
    # handful of tasks (same fix as q_session_cap; REPARTITION_BY_NUM
    # satisfies the clustering requirement and scales with the cluster)
    ev = ev.repartition(spark.sparkContext.defaultParallelism, F.col("user_id"))
    return ev.groupBy("user_id").applyInPandas(
        zscore, schema="event_id bigint, user_id bigint, z double"
    )


@udtf(returnType="bigram: string")
class CharBigrams:
    """Python UDTF (Spark 4): explode a string into character bigrams."""

    def eval(self, text: str):  # noqa: D102
        if text:
            for i in range(len(text) - 1):
                yield (text[i : i + 2],)


@register(
    "q_python_udtf",
    oracle="""
        SELECT bigram, count(*) AS n
        FROM (
            SELECT unnest(list_filter(
                       list_transform(string_split(text, ''), (c, i) -> substr(text, i, 2)),
                       s -> length(s) = 2)) AS bigram
            FROM documents
        )
        GROUP BY bigram
    """,
    category="udf",
)
def q_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join: one input row → many output rows
    (char bigrams), then a plain aggregate."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.udtf.register("char_bigrams", CharBigrams)
    return spark.sql(
        """
        SELECT b.bigram, count(*) AS n
        FROM documents d, LATERAL char_bigrams(d.text) b
        GROUP BY b.bigram
        """
    )


@register(
    "q_write_roundtrip",
    oracle="""
        SELECT year(o_orderdate) AS o_year,
               count(*) AS n,
               round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 4) AS total  -- exact cents (5.9e9)
        FROM orders
        GROUP BY year(o_orderdate)
    """,
    category="sink",
)
def q_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink roundtrip: write orders partitioned by
    year, read back, aggregate. The oracle aggregates the ORIGINAL
    table — proving the sink is lossless (including the partition
    column's value-to-directory-to-value trip)."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    out = scratch_dir("parquet_roundtrip")
    o.write.mode("overwrite").partitionBy("o_year").parquet(out)
    # explicit read schema: an empty input writes zero part files and
    # schema inference fails (UNABLE_TO_INFER_SCHEMA) — degenerate audit
    back = spark.read.schema(o.schema).parquet(out)
    return (
        back.groupBy(F.col("o_year").cast("int").alias("o_year"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(  # exact cents sum (5.9e9 magnitude at sf0.1)
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("double") / 100.0, 4
            ).alias("total"),
        )
    )


@register(
    "q_map_in_arrow",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events
        GROUP BY event_type
    """,
    category="udf",
)
def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (Spark 4's Arrow-native batch map): the Python fn
    receives raw pyarrow RecordBatches — no pandas conversion layer at
    all, the cheapest Python hop Spark offers (columnar in, columnar
    out; the pattern for calling pyarrow.compute / numpy kernels on
    whole batches). Here each batch converts value dollars to exact
    integer cents via pyarrow.compute with round_mode matched to both
    engines' round-half-away-from-zero (pyarrow: half_towards_infinity), then a normal JVM-side
    aggregate finishes — the Python stage does per-row arithmetic
    only, all shuffling stays JVM-side."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def to_cents(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            cents = pc.cast(
                pc.round(
                    pc.multiply(tbl.column("value"), pa.scalar(100.0)),
                    ndigits=0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [tbl.column("event_type").combine_chunks(), cents.combine_chunks()],
                names=["event_type", "cents"],
            )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    out = ev.mapInArrow(to_cents, schema="event_type string, cents bigint")
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("cents"),
    )
