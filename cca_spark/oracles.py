"""DuckDB oracle SQL builders.

Each queries() entry in ``__spark_entry__`` gets an equivalent DuckDB SQL
string built here. The oracle re-derives the transcripts table from the
same parquet bytes with the *shared* derivation SQL
(`cca_spark.transcripts.TRANSCRIPTS_SQL`) and then re-expresses each
operator in plain SQL (RE2 ``regexp_extract`` for the parse stage — the
patterns are written in the common Python-re/RE2 subset).

DuckDB-only dialect is allowed in this module (the Spark side is DataFrame
code, only results must match).
"""

from __future__ import annotations

from cca_spark.ontology import (
    category_edges_values_sql,
    role_ontology_values_sql,
    tool_ontology_values_sql,
)
from cca_spark.rules import RULES, sig_case_sql
from cca_spark.transcripts import duckdb_transcripts_sql


def transcripts_cte(sf_dir: str) -> str:
    return f"t AS ({duckdb_transcripts_sql(sf_dir)})"


def facts_sql_body() -> str:
    """UNION ALL of one regexp extraction per rule over CTE ``t``.

    Each generated turn embeds at most one occurrence per rule, so a single
    regexp_extract per rule is exhaustive; span offsets are recovered via
    strpos on the unique full match (0-based to match Python ``m.start()``).
    """
    parts = []
    for r in RULES:
        pat = r.pattern.replace("'", "''")
        full = f"regexp_extract(text, '{pat}', 0)"
        # per-tool and per-role sub-bank scopes (rules.py Rule.tool_scope /
        # Rule.role_scope): identical predicates in the pandas kernel, the
        # Spark SQL strategy, and here
        scope = f" AND tool = '{r.tool_scope}'" if r.tool_scope else ""
        if r.role_scope:
            scope += f" AND role = '{r.role_scope}'"
        # significance: static literal, or the rule's value-comparing CASE
        # generated from the shared SigDerive spec (rules.sig_case_sql)
        sig = sig_case_sql(r, lambda g, _p=pat: f"regexp_extract(text, '{_p}', {g})")
        parts.append(
            f"""
  SELECT
    conv_id || '-' || cast(turn_idx AS varchar) || '-' ||
      cast(strpos(text, {full}) - 1 AS varchar) || '-' ||
      cast(strpos(text, {full}) - 1 + length({full}) AS varchar) || '-' ||
      '{r.rule_id}' AS entity_id,
    conv_id, turn_idx, role, tool, ts,
    '{r.rule_id}' AS rule_id,
    '{r.sink}' AS sink,
    {sig} AS significance,
    cast(strpos(text, {full}) - 1 AS int) AS span_start,
    cast(strpos(text, {full}) - 1 + length({full}) AS int) AS span_end,
    regexp_extract(text, '{pat}', 1) AS value
  FROM t WHERE regexp_matches(text, '{pat}'){scope}"""
        )
    return "\n  UNION ALL\n".join(parts)


def facts_cte(sf_dir: str) -> str:
    return f"{transcripts_cte(sf_dir)},\nfacts AS (\n{facts_sql_body()}\n)"


def enriched_cte(sf_dir: str) -> str:
    """facts + broadcast ontology join + date bucket + dead-letter rerouting."""
    return f"""{facts_cte(sf_dir)},
enriched AS (
  SELECT f.*, tool_ontology.category, tool_ontology.family,
         tool_ontology.risk_level, role_ontology.actor_kind,
         cast(f.ts AS date) AS date_bucket
  FROM facts f
  LEFT JOIN {tool_ontology_values_sql()} ON f.tool = tool_ontology.tool
  LEFT JOIN {role_ontology_values_sql()} ON f.role = role_ontology.role
),
routed AS (
  SELECT * REPLACE (
    CASE WHEN sink = 'tool_invocation' AND category IS NULL
         THEN 'dead_letter' ELSE sink END AS sink)
  FROM enriched
)"""


# Convenience aliases so __spark_entry__ reads cleanly
def with_routed(sf_dir: str, select: str) -> str:
    return f"WITH {enriched_cte(sf_dir)}\n{select}"


def with_facts(sf_dir: str, select: str) -> str:
    return f"WITH {facts_cte(sf_dir)}\n{select}"


def with_transcripts(sf_dir: str, select: str) -> str:
    return f"WITH {transcripts_cte(sf_dir)}\n{select}"


def closure_recursive_sql() -> str:
    """Reflexive-transitive category closure as a recursive CTE (oracle for
    the driver-side fixpoint in cca_spark.ontology.ontology_closure_df)."""
    return f"""
WITH RECURSIVE edges AS (
  SELECT child, parent FROM {category_edges_values_sql()}
),
cats AS (
  SELECT child AS category FROM edges UNION SELECT parent FROM edges
),
walk(category, ancestor) AS (
  SELECT category, category FROM cats
  UNION
  SELECT w.category, e.parent FROM walk w JOIN edges e ON w.ancestor = e.child
)
SELECT category, ancestor FROM walk
"""
