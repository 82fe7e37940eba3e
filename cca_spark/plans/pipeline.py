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
) -> DataFrame:
    """``slim=True`` prunes the fact stream to aggregate-needed columns at
    the UDF boundary (parse.SLIM_FACT_COLUMNS) — Catalyst cannot project
    into an opaque mapInPandas, so the pruning is explicit. Salting keys
    on conv_id alone in slim mode (no entity_id)."""
    facts = parse_facts(transcripts, strategy=parse_strategy, slim=slim)
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
    """Flagship query: routed fact counts per (sink, tool, date_bucket).

    Uses the slim fact stream: the aggregate reads only
    (conv_id, sink, tool, date_bucket), so the parse stage never ships
    entity_id/span/value bytes through Arrow (aggregate-identical to the
    full stream; test_slim_parse_agg_equivalence)."""
    transcripts = load_transcripts(spark, sf_dir)
    return agg_per_sink(routed_facts(spark, transcripts, parse_strategy, slim=True))
