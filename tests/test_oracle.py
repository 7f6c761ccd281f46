"""Oracle-engine semantics tests: hand-computed expectations for the
correlation edge cases flagged in SURVEY §7.3 (after/threshold reset
anchoring, xbit expiry boundary, gate quirk)."""

from datetime import datetime, timezone

from oracle.engine import Event, OracleEngine
from sagan_spark.rules.compiler import compile_ruleset, compile_ruleset_from_dir


def ev(conv, turn, text, epoch, role="user", tool="sshd"):
    return Event(conv_id=conv, turn_idx=turn, role=role, text=text,
                 tool=tool, ts=datetime.fromtimestamp(epoch, tz=timezone.utc))


T0 = 1704067200  # 2024-01-01T00:00:00Z (Monday)


def engine(rules_text, **kw):
    return OracleEngine(compile_ruleset(rules_text, **kw))


def test_simple_content_alert():
    e = engine('alert syslog any any -> any any '
               '(msg:"m"; content:"Invalid login"; sid:1;)')
    out = e.run([ev("c1", 0, "Invalid login from 1.2.3.4", T0),
                 ev("c1", 1, "all good", T0 + 10)])
    assert len(out["alerts"]) == 1
    a = out["alerts"][0]
    assert (a["sid"], a["turn_idx"]) == (1, 0)
    # no extraction requested → host fallback (engine.c:967-1018)
    assert a["ip_src"] == "c1" and a["proto"] == "udp" and a["src_port"] == 514
    assert out["counters"]["saganfound"] == 1
    assert out["counters"]["alert_total"] == 1


def test_gate_last_present_wins_quirk():
    """engine.c:401-485: each gate block re-inits the fail flag, so a failing
    program gate is forgiven by a passing facility gate."""
    e = engine('alert syslog any any -> any any (msg:"m"; '
               'program: nomatch; syslog_facility: user; content:"x"; sid:1;)')
    out = e.run([ev("c1", 0, "x marks", T0, role="user", tool="sshd")])
    assert len(out["alerts"]) == 1  # program failed but facility (last) passed


def test_after_fires_only_past_count():
    """after count 3 seconds 300: alerts only on the 4th+ hit in window
    (after.c:140-147: fires when count > C)."""
    e = engine('alert syslog any any -> any any (msg:"m"; '
               'content:"login failed"; after: track by_src, count 3, '
               'seconds 300; sid:1;)')
    evs = [ev("c1", t, "login failed", T0 + t * 10) for t in range(6)]
    out = e.run(evs)
    assert [a["turn_idx"] for a in out["alerts"]] == [3, 4, 5]
    assert out["counters"]["after_total"] == 3
    assert out["counters"]["saganfound"] == 6


def test_after_window_reset():
    """Counter resets when gap from window anchor exceeds S
    (after.c:130-137)."""
    e = engine('alert syslog any any -> any any (msg:"m"; '
               'content:"login failed"; after: track by_src, count 2, '
               'seconds 60; sid:1;)')
    # 3 quick hits (third fires), then a hit 100s after the anchor → reset
    times = [T0, T0 + 10, T0 + 20, T0 + 120, T0 + 130, T0 + 140]
    evs = [ev("c1", t, "login failed", ts) for t, ts in enumerate(times)]
    out = e.run(evs)
    # t=2 fires (count 3>2). t=3: 120-0 > 60 → reset count=1 → suppressed.
    # t=4: count 2 → suppressed. t=5: count 3 > 2 → fires.
    assert [a["turn_idx"] for a in out["alerts"]] == [2, 5]


def test_after_tracks_keys_independently():
    e = engine('alert syslog any any -> any any (msg:"m"; '
               'content:"login failed"; after: track by_src, count 1, '
               'seconds 300; sid:1;)')
    evs = [ev("a", 0, "login failed", T0), ev("b", 0, "login failed", T0 + 1),
           ev("a", 1, "login failed", T0 + 2), ev("b", 1, "login failed", T0 + 3)]
    out = e.run(evs)
    assert sorted((a["conv_id"], a["turn_idx"]) for a in out["alerts"]) == \
        [("a", 1), ("b", 1)]


def test_threshold_limit_suppresses_after_count():
    """threshold type limit count 2: first 2 alert, later suppressed; the
    rolling utime (threshold.c:131) means a 60s+ idle gap resets."""
    e = engine('alert syslog any any -> any any (msg:"m"; '
               'content:"probe"; threshold: type limit, track by_src, '
               'count 2, seconds 60; sid:1;)')
    times = [T0, T0 + 10, T0 + 20, T0 + 30, T0 + 120]
    evs = [ev("c1", t, "probe", ts) for t, ts in enumerate(times)]
    out = e.run(evs)
    # t0,t1 alert; t2,t3 suppressed (count 3,4 > 2);
    # t4: gap 120-30=90 > 60 → reset count=1 → alerts.
    assert [a["turn_idx"] for a in out["alerts"]] == [0, 1, 4]
    assert out["counters"]["threshold_total"] == 2


def test_threshold_rolling_anchor_differs_from_after():
    """threshold updates utime on EVERY event (threshold.c:131-132) — a
    steady drip never resets; after anchors to the window start."""
    e = engine('alert syslog any any -> any any (msg:"m"; '
               'content:"probe"; threshold: type limit, track by_src, '
               'count 1, seconds 60; sid:1;)')
    # events every 50s: each gap < 60 so window never expires for threshold
    evs = [ev("c1", t, "probe", T0 + t * 50) for t in range(5)]
    out = e.run(evs)
    assert [a["turn_idx"] for a in out["alerts"]] == [0]


def test_xbit_set_isset_and_expiry():
    rules = '''
alert syslog any any -> any any (msg:"set"; content:"stage1"; xbits: set,sb,track ip_src,expire 100; sid:1;)
alert syslog any any -> any any (msg:"chk"; content:"stage2"; xbits: isset,sb,track ip_src; sid:2;)
'''
    e = engine(rules)
    evs = [
        ev("c1", 0, "stage2 early", T0),          # isset before set → no
        ev("c1", 1, "stage1 fire", T0 + 10),      # set (expire@ T0+110)
        ev("c1", 2, "stage2 now", T0 + 50),       # isset live → alert
        ev("c1", 3, "stage2 late", T0 + 200),     # expired (xbit-mmap.c:208)
        ev("c2", 4, "stage2 other", T0 + 60),     # different key → no
    ]
    out = e.run(evs)
    got = [(a["sid"], a["turn_idx"]) for a in out["alerts"]]
    assert got == [(1, 1), (2, 2)]


def test_xbit_unset():
    rules = '''
alert syslog any any -> any any (msg:"set"; content:"s-on"; xbits: set,b,track ip_src,expire 1000; sid:1;)
alert syslog any any -> any any (msg:"unset"; content:"s-off"; xbits: unset,b,track ip_src; sid:2;)
alert syslog any any -> any any (msg:"chk"; content:"check"; xbits: isset,b,track ip_src; sid:3;)
'''
    e = engine(rules)
    evs = [ev("c1", 0, "s-on", T0), ev("c1", 1, "check", T0 + 10),
           ev("c1", 2, "s-off", T0 + 20), ev("c1", 3, "check", T0 + 30)]
    out = e.run(evs)
    got = [(a["sid"], a["turn_idx"]) for a in out["alerts"]]
    assert got == [(1, 0), (3, 1), (2, 2)]  # (conv, turn, sid) ordering


def test_xbit_isnotset():
    rules = '''
alert syslog any any -> any any (msg:"set"; content:"arm"; xbits: set,nb,track ip_src,expire 1000; sid:1;)
alert syslog any any -> any any (msg:"notset"; content:"fresh"; xbits: isnotset,nb,track ip_src; sid:2;)
'''
    e = engine(rules)
    evs = [ev("c1", 0, "fresh one", T0), ev("c1", 1, "arm it", T0 + 10),
           ev("c1", 2, "fresh two", T0 + 20)]
    out = e.run(evs)
    got = [(a["sid"], a["turn_idx"]) for a in out["alerts"]]
    assert got == [(2, 0), (1, 1)]


def test_ignore_list_short_circuit():
    e = OracleEngine(compile_ruleset(
        'alert syslog any any -> any any (msg:"m"; content:"DEBUG"; sid:1;)',
        ignore_text="DEBUG heartbeat ok\n"))
    out = e.run([ev("c1", 0, "DEBUG heartbeat ok", T0),
                 ev("c1", 1, "DEBUG something else", T0 + 1)])
    assert out["counters"]["ignore_count"] == 1
    assert len(out["drops"]) == 1
    assert [a["turn_idx"] for a in out["alerts"]] == [1]


def test_alert_time_window():
    # T0 = Monday 2024-01-01 00:00 UTC; day bit 1 (Monday), office hours
    rules = ('alert syslog any any -> any any (msg:"m"; content:"badge"; '
             'alert_time: days 12345, time 0800-1700; sid:1;)')
    e = engine(rules)
    out = e.run([ev("c1", 0, "badge swipe", T0 + 9 * 3600),      # 09:00 Mon
                 ev("c1", 1, "badge swipe", T0 + 20 * 3600),     # 20:00 Mon
                 ev("c1", 2, "badge swipe", T0 + 5 * 86400 + 9 * 3600)])  # Sat
    assert [a["turn_idx"] for a in out["alerts"]] == [0]


def test_midnight_wrap_alert_time():
    rules = ('alert syslog any any -> any any (msg:"m"; content:"night"; '
             'alert_time: days 1, time 2200-0600; sid:1;)')
    e = engine(rules)
    out = e.run([ev("c1", 0, "night shift", T0 + 23 * 3600),     # Mon 23:00
                 ev("c1", 1, "night shift", T0 + 12 * 3600),     # Mon 12:00
                 ev("c1", 2, "night shift", T0 + 86400 + 3 * 3600)])  # Tue 03:00
    # Tue 03:00 passes: previous day (Mon) in days and rule wraps midnight
    assert [a["turn_idx"] for a in out["alerts"]] == [0, 2]


def test_flow_targeting_with_parse_ip():
    rules = ('alert syslog 10.0.0.0/8 any -> any any (msg:"m"; '
             'content:"connection from"; parse_src_ip: 1; sid:1;)')
    e = engine(rules)
    out = e.run([ev("c1", 0, "connection from 10.1.2.3:55", T0),
                 ev("c1", 1, "connection from 11.1.2.3:55", T0 + 1)])
    assert [a["turn_idx"] for a in out["alerts"]] == [0]
    assert out["alerts"][0]["ip_src"] == "10.1.2.3"
    assert out["alerts"][0]["src_port"] == 55


def test_drop_action_and_counters():
    e = engine('drop syslog any any -> any any (msg:"m"; content:"noise"; sid:9;)')
    out = e.run([ev("c1", 0, "noise here", T0)])
    assert out["alerts"][0]["action"] == "drop"


def test_fixture_corpus_runs_on_generated_transcripts():
    from sagan_spark.datagen import gen_rows
    rs = compile_ruleset_from_dir("rules-fixtures")
    e = OracleEngine(rs)
    rows = gen_rows(40)
    evs = [Event(**r) for r in rows]
    out = e.run(evs)
    c = out["counters"]
    assert c["events_received"] == len(rows)
    assert c["ignore_count"] > 0            # DEBUG heartbeat fodder
    assert c["alert_total"] > 0
    assert c["events_received"] == c["events_processed"] + c["ignore_count"]
    # multiple distinct rules fire on the template bank
    assert len({a["sid"] for a in out["alerts"]}) >= 8
