"""Snapshot mapping: classify entries across two versions of a tree as
mapped_eq / mapped_neq / renamed / moved / deleted / added.

Reference analog: the dirtree engine classifies file pairs across two
versions as modified/renamed/moved/copied/glued
(/root/reference/src/ast/analyzing/engine/dirtree.ml:1224-1246) and the
file-mapping materialization query joins versions on location, BINDing
mappedEqTo vs mappedNeqTo by digest equality, then matches leftovers by
digest (/root/reference/cca/queries/materialize/file_mapping.rq:14-41).

Spark-first shape: two equi-joins (path, then digest+rank) and two anti
joins — no windowed state beyond a per-digest row_number, every join
shuffle-keyed. The digest-rank join pairs leftover entries 1:1 even when
digests repeat (duplicate content): rank is deterministic (ordered by
doc_id), so both engines compute the identical pairing.

The two snapshots are derived deterministically from ``documents`` (no
external data): v1 = every doc at ``dir<doc_id%10>/f_<doc_id>.txt``;
v2 applies, in priority order, delete (%11), rename-in-place (%7),
move-across-dir (%5), content-modify (%3), and adds new ``incoming/``
entries (%13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _v1(docs: DataFrame) -> DataFrame:
    path = F.concat(
        F.lit("dir"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("/f_"),
        F.col("doc_id").cast("string"),
        F.lit(".txt"),
    )
    return docs.select("doc_id", path.alias("path"), F.md5("text").alias("digest"))


def _v2(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    base_dir = F.concat(F.lit("dir"), (d % 10).cast("string"))
    moved_dir = F.concat(F.lit("dir"), ((d + 1) % 10).cast("string"))
    fname = F.concat(F.lit("/f_"), d.cast("string"), F.lit(".txt"))
    gname = F.concat(F.lit("/g_"), d.cast("string"), F.lit(".txt"))
    path = (
        F.when(d % 7 == 0, F.concat(base_dir, gname))  # renamed in place
        .when(d % 5 == 0, F.concat(moved_dir, fname))  # moved across dirs
        .otherwise(F.concat(base_dir, fname))
    )
    digest = F.when(
        (d % 3 == 0) & (d % 7 != 0) & (d % 5 != 0),
        F.md5(F.concat(F.col("text"), F.lit(" v2"))),  # content modified
    ).otherwise(F.md5("text"))
    survivors = docs.filter(d % 11 != 0).select(  # %11 deleted
        "doc_id", path.alias("path"), digest.alias("digest")
    )
    # Added entries live in a PROVABLY disjoint id space (negative ids):
    # real doc_ids are non-negative at every scale factor, so -(id)-1 can
    # never collide with a survivor — an additive offset (the old +500_000)
    # breaks once doc_ids exceed the offset (ADVICE r02), corrupting the
    # anti-joins and making the per-digest row_number tie-ambiguous.
    added = docs.filter(d % 13 == 0).select(
        (-d - 1).alias("doc_id"),
        F.concat(F.lit("incoming/h_"), d.cast("string"), F.lit(".txt")).alias("path"),
        F.md5(F.concat(F.col("text"), F.lit(" added"))).alias("digest"),
    )
    return survivors.unionByName(added)


def snapshot_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(old_path, new_path, mapping) for every entry of either snapshot."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    v1 = _v1(docs)
    v2 = _v2(docs)

    # 1. same-location join: mapped_eq / mapped_neq (the BIND(IF(...)))
    same_path = (
        v1.alias("a")
        .join(v2.alias("b"), F.col("a.path") == F.col("b.path"))
        .select(
            F.col("a.path").alias("old_path"),
            F.col("b.path").alias("new_path"),
            F.when(F.col("a.digest") == F.col("b.digest"), F.lit("mapped_eq"))
            .otherwise(F.lit("mapped_neq"))
            .alias("mapping"),
        )
    )

    # 2. leftovers matched by (digest, per-digest rank): renamed vs moved
    l1 = v1.join(v2, "path", "left_anti")
    l2 = v2.join(v1, "path", "left_anti")
    w = Window.partitionBy("digest").orderBy("doc_id")
    l1r = l1.withColumn("rn", F.row_number().over(w))
    l2r = l2.withColumn("rn", F.row_number().over(w))
    dig = (
        l1r.alias("a")
        .join(
            l2r.alias("b"),
            (F.col("a.digest") == F.col("b.digest")) & (F.col("a.rn") == F.col("b.rn")),
        )
        .select(
            F.col("a.path").alias("old_path"),
            F.col("b.path").alias("new_path"),
            F.when(
                F.substring_index(F.col("a.path"), "/", 1)
                == F.substring_index(F.col("b.path"), "/", 1),
                F.lit("renamed"),
            )
            .otherwise(F.lit("moved"))
            .alias("mapping"),
        )
    )

    # 3. the rest: deleted (v1-only) / added (v2-only)
    deleted = (
        l1r.join(l2r.select("digest", "rn"), ["digest", "rn"], "left_anti")
        .select(
            F.col("path").alias("old_path"),
            F.lit(None).cast("string").alias("new_path"),
            F.lit("deleted").alias("mapping"),
        )
    )
    added = (
        l2r.join(l1r.select("digest", "rn"), ["digest", "rn"], "left_anti")
        .select(
            F.lit(None).cast("string").alias("old_path"),
            F.col("path").alias("new_path"),
            F.lit("added").alias("mapping"),
        )
    )
    return same_path.unionByName(dig).unionByName(deleted).unionByName(added)
