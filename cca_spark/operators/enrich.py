"""ENRICH — broadcast ontology joins.

Reference analog: SPARQL INSERT materialization joins facts against
ontologies and derived keys (invocation resolution via CONCAT'd keys,
/root/reference/cca/queries/materialize/java/new_ivk0.rq:63-95; class
hierarchy via rdfs inference, class_hierarchy.rq). CCA delegates the join
to Virtuoso; we delegate to Catalyst with explicit ``broadcast()`` hints —
the ontology side is ontology-sized (tiny), the fact side is the 10^12-turn
stream, so a shuffle on the fact side would be the single worst plan choice
at scale.

Unknown tools survive as NULL-category rows (dead-letter candidates) — the
reference's ``FILTER NOT EXISTS`` anti-join pattern
(/root/reference/cca/queries/materialize/java/grafted_method.rq:32-34).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cca_spark.ontology import (
    ontology_closure_df,
    role_ontology_df,
    tool_ontology_df,
)


def enrich_facts(
    spark: SparkSession,
    facts: DataFrame,
    with_closure: bool = False,
) -> DataFrame:
    """Attach tool ontology (category/family/risk_level), role actor_kind,
    and the date bucket used by the aggregate stage.

    All joins are broadcast left joins: fact-side partitioning is
    preserved, no shuffle is introduced (verify with .explain —
    BroadcastHashJoin, no Exchange on the fact side).
    """
    tools = F.broadcast(tool_ontology_df(spark))
    roles = F.broadcast(role_ontology_df(spark))

    out = (
        facts.join(tools, "tool", "left")
        .join(roles, "role", "left")
        .withColumn("date_bucket", F.col("ts").cast("date"))
    )
    if with_closure:
        closure = F.broadcast(
            ontology_closure_df(spark)
            .groupBy("category")
            .agg(F.sort_array(F.collect_list("ancestor")).alias("category_ancestors"))
        )
        out = out.join(closure, "category", "left")
    return out


def dead_letters(enriched: DataFrame) -> DataFrame:
    """Tool invocations whose tool is not in the ontology.

    Anti-join shape (J4); here the broadcast left join already materialized
    the miss as NULL category, so this is a cheap filter — no extra join.
    """
    return enriched.filter(
        (F.col("sink") == "tool_invocation") & F.col("category").isNull()
    )
