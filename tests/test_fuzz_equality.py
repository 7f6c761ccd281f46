"""Property-based engine equality (SURVEY §5.2 item 4): random rule ∧
random transcript rows — the Spark pipeline and the pure-Python oracle
must emit identical routed rows and counters.  Small example counts
(each example runs a real Spark job); the value is coverage of rule
shapes the hand-written golden tests don't enumerate."""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from oracle.engine import Event, OracleEngine
from sagan_spark.pipeline import run_pipeline
from sagan_spark.rules.compiler import compile_ruleset

T0 = 1704067200

_WORDS = ("alpha", "beta", "gamma", "delta", "login", "failed", "probe",
          "stage", "marker", "from", "10.0.0.7", "10.0.0.8:99")

_texts = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=6).map(
    " ".join)


@st.composite
def _rule(draw):
    body = [f'content:"{draw(st.sampled_from(_WORDS[:9]))}"']
    if draw(st.booleans()):
        body.append("nocase")
    if draw(st.booleans()):
        # byte-window modifiers on the first content (engine.c:502-558)
        body.append(f"offset:{draw(st.integers(0, 8))}")
        body.append(f"depth:{draw(st.integers(3, 20))}")
    if draw(st.booleans()):
        body.append(f'content:!"{draw(st.sampled_from(_WORDS[:9]))}"')
    if draw(st.booleans()):
        body.append(f'meta_content:"%sagan%",'
                    f'{draw(st.sampled_from(_WORDS[:6]))},'
                    f'{draw(st.sampled_from(_WORDS[:6]))}')
    if draw(st.booleans()):
        body.append(f'program: {draw(st.sampled_from(("sshd", "ngin*", "nomatch")))}')
    if draw(st.booleans()):
        # facility/level after program exercises the last-present-
        # gate-wins quirk (engine.c:401-485) across the full pipeline
        key = draw(st.sampled_from(("facility", "syslog_level")))
        vals = draw(st.sampled_from(("user", "assistant", "user|tool",
                                     "system")))
        body.append(f'{key}: {vals}')
    corr = draw(st.sampled_from(
        ("none", "after", "threshold", "xbit", "flexbit")))
    second = None
    if corr == "after":
        body.append(f"after: track by_src, count "
                    f"{draw(st.integers(1, 3))}, seconds "
                    f"{draw(st.sampled_from((30, 60, 300)))}")
    elif corr == "threshold":
        body.append(f"threshold: type limit, track by_src, count "
                    f"{draw(st.integers(1, 3))}, seconds "
                    f"{draw(st.sampled_from((30, 60, 300)))}")
    elif corr == "xbit":
        body.append(f"xbits: set,fz,track ip_src,expire "
                    f"{draw(st.sampled_from((50, 200)))}")
        # cross-rule consumer: isset (optionally combined with after —
        # the engine-order interleaving path)
        cbody = [f'content:"{draw(st.sampled_from(_WORDS[:9]))}"',
                 "xbits: isset,fz,track ip_src"]
        if draw(st.booleans()):
            cbody.append("after: track by_src, count 1, seconds 120")
        second = ('alert syslog any any -> any any (msg:"fz2"; '
                  + "; ".join(cbody) + "; sid:78;)")
    elif corr == "flexbit":
        body.append(f"flexbits: set,fzf,"
                    f"{draw(st.sampled_from((50, 200)))}")
        cdir = draw(st.sampled_from(("by_src", "both", "none")))
        second = ('alert syslog any any -> any any (msg:"fz2"; '
                  f'content:"{draw(st.sampled_from(_WORDS[:9]))}"; '
                  f'flexbits: isset,{cdir},fzf; sid:78;)')
    rule = ('alert syslog any any -> any any (msg:"fz"; '
            + "; ".join(body) + "; sid:77;)")
    return rule + ("\n" + second if second else "")


@st.composite
def _rows(draw):
    n = draw(st.integers(2, 14))
    rows = []
    for i in range(n):
        conv = f"c{draw(st.integers(0, 2))}"
        rows.append({
            "conv_id": conv, "turn_idx": i,
            "role": draw(st.sampled_from(("user", "assistant", "tool"))),
            "text": draw(_texts), "tool": "sshd",
            "ts": datetime.fromtimestamp(
                T0 + draw(st.integers(0, 400)), tz=timezone.utc)})
    return rows


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rule=_rule(), rows=_rows())
def test_random_rule_random_rows_equal(spark, rule, rows):
    rs = compile_ruleset(rule)
    oracle = OracleEngine(rs)
    o = oracle.run([Event(**r) for r in rows])
    res = run_pipeline(
        spark,
        spark.createDataFrame(
            pd.DataFrame(rows),
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"),
        rs)
    got = (res.alerts.select("conv_id", "turn_idx", "sid").toPandas()
           .sort_values(["conv_id", "turn_idx", "sid"])
           .reset_index(drop=True))
    want = sorted((a["conv_id"], a["turn_idx"], a["sid"])
                  for a in o["alerts"])
    assert list(zip(got["conv_id"], got["turn_idx"], got["sid"])) == want
    c = res.counters.toPandas().iloc[0]
    for k in ("events_received", "saganfound", "alert_total",
              "after_total", "threshold_total"):
        assert int(c[k]) == o["counters"][k], k
