"""Stage 4 — ENRICH: broadcast-join the small lookup tables (SURVEY §2.4).

The reference scans these linearly per alert (classifications.c:151-169,
references.c:141-209, gen-msg.c:132-148); here they are classic broadcast
hash joins — each lookup table is tiny, read-only, and loaded once on the
driver, so ``F.broadcast`` guarantees BroadcastHashJoinExec with no
shuffle regardless of the fact side's size (100 TB safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .rules.compiler import RuleSet


def classification_df(spark: SparkSession, ruleset: RuleSet) -> DataFrame:
    rows = [(k, v[0], v[1]) for k, v in ruleset.classifications.items()]
    return spark.createDataFrame(
        rows or [("__none__", "", 0)],
        "classtype string, class_desc string, class_pri int")


def reference_df(spark: SparkSession, ruleset: RuleSet) -> DataFrame:
    """Per-rule reference URLs: (sid, ref_name, ref_url) — the
    ``[Xref => url]`` strings of Reference_Lookup (references.c:141-209)."""
    rows = []
    for r in ruleset.rules:
        for name, rid in r.references:
            prefix = ruleset.references.get(name, "")
            rows.append((r.sid, name, f"{prefix}{rid}"))
    return spark.createDataFrame(
        rows or [(0, "__none__", "")],
        "sid long, ref_name string, ref_url string")


def gen_msg_df(spark: SparkSession, ruleset: RuleSet) -> DataFrame:
    rows = [(g, a, m) for (g, a), m in ruleset.gen_msg.items()]
    return spark.createDataFrame(
        rows or [(0, 0, "")], "gid long, aid long, gen_msg string")


def enrich_alerts(alerts: DataFrame, spark: SparkSession,
                  ruleset: RuleSet) -> DataFrame:
    """classtype → (class_desc, class_pri) broadcast join (J1).  The rule
    compiler already folded priority in; the join re-derives class_desc for
    the alert sink exactly like Classtype_Lookup at output time
    (classifications.c:151-169)."""
    cls = classification_df(spark, ruleset)
    return alerts.join(F.broadcast(cls), "classtype", "left") \
                 .withColumn("class_desc", F.coalesce("class_desc", F.lit("")))


def attach_references(alerts: DataFrame, spark: SparkSession,
                      ruleset: RuleSet) -> DataFrame:
    """(sid) → collected reference URLs (J2), broadcast join + groupBy on
    the broadcast side only (tiny).  URLs are sorted and comma-joined
    into one string column, the ``[Xref => url]`` suffix block the
    reference appends to every alert (src/references.c:141-209)."""
    if not any(r.references for r in ruleset.rules):
        # no rule carries references — don't pay a dead BroadcastExchange
        return alerts.withColumn("ref_urls", F.lit(""))
    refs = (reference_df(spark, ruleset)
            .groupBy("sid")
            .agg(F.concat_ws(
                ",", F.sort_array(F.collect_list("ref_url")))
                .alias("ref_urls")))
    return (alerts.join(F.broadcast(refs), "sid", "left")
            .withColumn("ref_urls", F.coalesce("ref_urls", F.lit(""))))


def attach_gen_msg(alerts: DataFrame, spark: SparkSession,
                   ruleset: RuleSet) -> DataFrame:
    """(gid, sid) → generator message (J3) — Generator_Lookup
    (src/gen-msg.c:132-148) as a broadcast join on the alert's
    (gid, sid) pair."""
    if not ruleset.gen_msg:
        return alerts.withColumn("gen_msg", F.lit(""))
    gm = gen_msg_df(spark, ruleset).withColumnRenamed("aid", "sid")
    return (alerts.join(F.broadcast(gm), ["gid", "sid"], "left")
            .withColumn("gen_msg", F.coalesce("gen_msg", F.lit(""))))
