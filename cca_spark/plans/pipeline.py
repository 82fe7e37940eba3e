"""End-to-end composition: parse → enrich → route → aggregate.

This is the flagship plan (reference lifecycle §3.2-3.3 of SURVEY.md: parse
workers → factbase load → materialization → pattern counting), expressed as
one lazy DataFrame graph so Catalyst sees the whole thing: the parquet scan
prunes to (conv_id, turn_idx, role, text, tool, ts), ontology joins go
broadcast, and the final groupBy runs partial+final with AQE sizing the
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cca_spark.operators.aggregate import agg_per_sink
from cca_spark.operators.enrich import enrich_facts
from cca_spark.operators.parse import parse_facts
from cca_spark.operators.route import route_facts, salted_repartition
from cca_spark.transcripts import load_transcripts


def routed_facts(
    spark: SparkSession,
    transcripts: DataFrame,
    parse_strategy: str = "pandas",
    salt: bool = False,
    n_salts: int = 16,
    slim: bool = False,
    with_value: bool = True,
) -> DataFrame:
    """``slim=True`` prunes the fact stream to aggregate-needed columns at
    the UDF boundary (parse.SLIM_FACT_COLUMNS) — Catalyst cannot project
    into an opaque mapInPandas, so the pruning is explicit. Salting keys
    on conv_id alone in slim mode (no entity_id). ``with_value=False``
    keeps entity_id/spans but drops the value extraction (r6 — for
    consumers like the range-containment join that never read it)."""
    facts = parse_facts(
        transcripts, strategy=parse_strategy, slim=slim, with_value=with_value
    )
    enriched = enrich_facts(spark, facts)
    routed = route_facts(enriched)
    if salt:
        routed = salted_repartition(routed, n_salts=n_salts)
    return routed


def pipeline_agg(
    spark: SparkSession,
    sf_dir: str,
    parse_strategy: str = "pandas",
) -> DataFrame:
    """Flagship query: routed fact counts per (sink, tool, date_bucket)."""
    transcripts = load_transcripts(spark, sf_dir)
    if parse_strategy == "pandas":
        return fused_pipeline_agg(spark, transcripts)
    return agg_per_sink(routed_facts(spark, transcripts, parse_strategy, slim=True))


def fused_pipeline_agg(spark: SparkSession, transcripts: DataFrame) -> DataFrame:
    """parse→enrich→route→aggregate with the PARTIAL aggregate pushed into
    the Arrow kernel (map-side combine through the UDF boundary, which
    Spark's own partial HashAggregate cannot cross): the kernel emits
    per-batch counts keyed by (conv_id, tool, date, rule-sink); the JVM
    side broadcast-joins the ontology, applies dead-letter rerouting to
    the partials (1:1 on the key, counts unaffected), and runs the final
    sum / countDistinct. Aggregate-identical to the unfused path
    (test_fused_pipeline_agg_equivalence); at 10^12 turns this shrinks
    Arrow egress by the per-batch fact/key ratio (~15x here)."""
    from pyspark.sql import functions as F

    from cca_spark.ontology import tool_ontology_df
    from cca_spark.operators.parse import parse_fact_partials
    from cca_spark.rules import DEAD_LETTER_SINK

    partials = parse_fact_partials(transcripts)
    tools = F.broadcast(tool_ontology_df(spark).select("tool", "category"))
    routed = partials.join(tools, "tool", "left").withColumn(
        "sink",
        F.when(
            (F.col("sink") == "tool_invocation") & F.col("category").isNull(),
            F.lit(DEAD_LETTER_SINK),
        ).otherwise(F.col("sink")),
    )
    return routed.groupBy(
        "sink", "tool", F.col("date_bucket").cast("date").alias("date_bucket")
    ).agg(
        F.sum("n").alias("n_rows"),
        F.countDistinct("conv_id").alias("n_convs"),
    )
