"""Golden equality: the Spark pipeline must reproduce the pure-Python
oracle exactly — routed rows per sink ordered by (conv_id, turn_idx, sid)
and per-sink aggregate counts (SURVEY §5.2 item 2; the north rule's
routed-row equality criterion)."""

import pandas as pd
import pytest

from oracle.engine import Event, OracleEngine
from sagan_spark.datagen import gen_rows
from sagan_spark.pipeline import run_pipeline
from sagan_spark.rules.compiler import compile_ruleset, compile_ruleset_from_dir

ALERT_CMP = ["conv_id", "turn_idx", "sid", "rev", "msg", "classtype",
             "pri", "ip_src", "src_port", "ip_dst", "dst_port", "proto",
             "text", "action"]


def spark_df_from_rows(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows),
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")


def run_both(spark, rows, ruleset):
    oracle = OracleEngine(ruleset)
    o = oracle.run([Event(**r) for r in rows])
    res = run_pipeline(spark, spark_df_from_rows(spark, rows), ruleset)
    return o, res


def assert_alerts_equal(o, res):
    got = (res.alerts.toPandas()
           .sort_values(["conv_id", "turn_idx", "sid"])
           .reset_index(drop=True))
    want = pd.DataFrame(o["alerts"], columns=ALERT_CMP + ["ts", "gid",
                                                          "class_desc"])
    if len(want) == 0:
        assert len(got) == 0
        return
    want = want.sort_values(["conv_id", "turn_idx", "sid"]
                            ).reset_index(drop=True)
    for col in ALERT_CMP:
        assert got[col].tolist() == want[col].tolist(), f"mismatch in {col}"
    assert got["class_desc"].tolist() == want["class_desc"].tolist()


def assert_counters_equal(o, res, keys=("events_received",
                                        "events_processed", "ignore_count",
                                        "saganfound", "alert_total",
                                        "after_total", "threshold_total")):
    got = res.counters.toPandas().iloc[0].to_dict()
    for k in keys:
        assert int(got[k]) == o["counters"][k], \
            f"{k}: spark={got[k]} oracle={o['counters'][k]}"


@pytest.fixture(scope="module")
def fixture_ruleset():
    return compile_ruleset_from_dir("rules-fixtures")


def test_full_fixture_corpus_equality(spark, fixture_ruleset):
    """The headline golden test: full 28-rule corpus over the generated
    transcripts — routed-row + counter equality."""
    rows = gen_rows(60)   # ~900 turns incl. 2 hot conversations
    o, res = run_both(spark, rows, fixture_ruleset)
    assert o["counters"]["alert_total"] > 0
    assert_alerts_equal(o, res)
    assert_counters_equal(o, res)
    # drop sink equality
    got_drops = (res.drops.toPandas()
                 .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert len(got_drops) == len(o["drops"])
    assert got_drops["turn_idx"].tolist() == \
        [d["turn_idx"] for d in o["drops"]]


def test_after_threshold_equality(spark):
    """Dense bursts straddling window boundaries (S-1, S, S+1 edges)."""
    from datetime import datetime, timezone
    T0 = 1704067200
    rules = compile_ruleset(
        'alert syslog any any -> any any (msg:"aft"; content:"login failed";'
        ' after: track by_src, count 2, seconds 60; sid:1;)\n'
        'alert syslog any any -> any any (msg:"thr"; content:"login failed";'
        ' threshold: type limit, track by_src, count 2, seconds 60; sid:2;)')
    rows = []
    for conv in range(4):
        offs = [0, 30, 59, 60, 61, 120, 121, 300, 310, 320]
        for t, off in enumerate(offs):
            rows.append({
                "conv_id": f"c{conv}", "turn_idx": t, "role": "user",
                "text": "login failed", "tool": "sshd",
                "ts": datetime.fromtimestamp(T0 + conv * 7 + off,
                                             tz=timezone.utc)})
    o, res = run_both(spark, rows, rules)
    assert_alerts_equal(o, res)
    assert_counters_equal(o, res)


def test_xbit_pair_equality(spark):
    from datetime import datetime, timezone
    T0 = 1704067200
    rules = compile_ruleset(
        'alert syslog any any -> any any (msg:"s1"; content:"stage1"; '
        'xbits: set,sb,track ip_src,expire 100; sid:1;)\n'
        'alert syslog any any -> any any (msg:"s2"; content:"stage2"; '
        'xbits: isset,sb,track ip_src; sid:2;)')
    rows = []
    for conv in range(3):
        seq = [("stage2 early", 0), ("stage1 go", 10), ("stage2 hit", 50),
               ("stage2 expired", 250), ("stage1 again", 260),
               ("stage2 rehit", 270)]
        for t, (txt, off) in enumerate(seq):
            rows.append({
                "conv_id": f"c{conv}", "turn_idx": t, "role": "user",
                "text": txt, "tool": "sshd",
                "ts": datetime.fromtimestamp(T0 + conv * 3 + off,
                                             tz=timezone.utc)})
    o, res = run_both(spark, rows, rules)
    assert_alerts_equal(o, res)
    assert_counters_equal(o, res)


def test_eve_log_and_malformed(spark, fixture_ruleset):
    from datetime import datetime, timezone
    rows = gen_rows(10)
    rows[3] = {**rows[3], "text": None}
    rows[4] = {**rows[4], "role": None}
    res = run_pipeline(spark, spark_df_from_rows(spark, rows),
                       fixture_ruleset)
    m = res.malformed.toPandas().iloc[0]
    assert int(m["malformed_text"]) == 1
    assert int(m["malformed_role"]) == 1
    assert int(m["events_received"]) == len(rows)
    # eve_log = processed (non-ignored) rows
    c = res.counters.toPandas().iloc[0]
    assert res.eve_logs.count() == int(c["events_processed"])


def test_eve_json_rendering(spark, fixture_ruleset):
    import json

    from sagan_spark.pipeline import to_eve_json
    rows = gen_rows(8)
    res = run_pipeline(spark, spark_df_from_rows(spark, rows),
                       fixture_ruleset)
    j = to_eve_json(res.eve_alerts).limit(1).toPandas()
    if len(j):
        doc = json.loads(j["eve"].iloc[0])
        # field parity with json-handler.c:113-216
        for k in ("timestamp", "flow_id", "event_type", "src_ip",
                  "dest_ip", "proto", "payload", "alert"):
            assert k in doc
        for k in ("action", "gid", "signature_id", "rev", "signature",
                  "category", "severity"):
            assert k in doc["alert"]


def test_hot_conversation_skew(spark, fixture_ruleset):
    """Zipf-hot conversations (FIXTURES §1) still produce exact results —
    the AQE/skew path changes physical distribution, never semantics."""
    rows = gen_rows(20, hot_convs=3, hot_len=400)
    o, res = run_both(spark, rows, fixture_ruleset)
    assert_alerts_equal(o, res)
    assert_counters_equal(o, res)
