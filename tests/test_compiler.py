"""Rule-compiler unit tests (SURVEY §5.2 item 3: head/body/negation/vars)."""

import re

import pytest

from sagan_spark.rules.compiler import (
    RuleParseError,
    cidr_to_range,
    compile_ruleset,
    compile_ruleset_from_dir,
    decode_hex_pipes,
    ip_to_int,
    load_classifications,
    load_references,
    parse_rule,
    translate_pcre,
)
from sagan_spark.rules.model import content_window, glob_to_regex

FIXTURES = "rules-fixtures"


def test_fixture_corpus_compiles():
    rs = compile_ruleset_from_dir(FIXTURES)
    assert len(rs.rules) == 33
    sids = [r.sid for r in rs.rules]
    assert sids == sorted(sids)  # load order preserved (rules.c:199-202)
    assert rs.classifications["brute-force"] == ("Brute Force Attack", 1)
    assert rs.references["cve"].startswith("http://cve.mitre.org")
    assert "DEBUG heartbeat ok" in rs.ignore_list
    assert len(rs.blacklist_ranges) == 2


def test_head_parsing():
    r = parse_rule('alert syslog 10.0.0.0/8 any -> !192.168.0.0/16 1024:65535 '
                   '(msg:"h"; content:"x"; sid:1;)')
    assert not r.head.all_any
    assert r.head.src_ip.contains(ip_to_int("10.1.2.3"))
    assert not r.head.src_ip.contains(ip_to_int("11.1.2.3"))
    assert r.head.dst_ip.contains(ip_to_int("8.8.8.8"))       # negated CIDR
    assert not r.head.dst_ip.contains(ip_to_int("192.168.1.1"))
    assert r.head.dst_port.contains(2000)
    assert not r.head.dst_port.contains(80)


def test_all_any_fast_track():
    r = parse_rule('alert syslog any any -> any any (msg:"a"; content:"x"; sid:2;)')
    assert r.head.all_any  # rules.c:303-310


def test_content_modifiers_attach_to_last_content():
    r = parse_rule('alert syslog any any -> any any (msg:"m"; '
                   'content:"A"; depth:8; content:"B"; distance:4; within:12; '
                   'sid:3;)')
    assert r.contents[0].depth == 8 and r.contents[0].distance == 0
    assert r.contents[1].distance == 4 and r.contents[1].within == 12


def test_negated_and_nocase_content():
    r = parse_rule('alert syslog any any -> any any (msg:"m"; '
                   'content:"keep"; nocase; content:!"drop"; sid:4;)')
    assert r.contents[0].nocase and not r.contents[0].negated
    assert r.contents[1].negated and not r.contents[1].nocase


def test_hex_pipe_decode():
    # Content_Pipe2 (src/util.c:934)
    assert decode_hex_pipes("a|3a 3b|b") == "a:;b"
    assert decode_hex_pipes("no pipes") == "no pipes"
    r = parse_rule('alert syslog any any -> any any (msg:"m"; '
                   'content:"colon|3a|sep"; sid:5;)')
    assert r.contents[0].pattern == "colon:sep"


def test_pcre_translation():
    p = translate_pcre('"/file system full/i"')
    assert p.flags & re.I
    assert p.compiled().search("FILE SYSTEM FULL")
    # possessive quantifiers / atomic groups / \x{..} now translate
    # (native in Python >= 3.11 re); only pattern recursion is rejected
    p2 = translate_pcre('"/user\\x{20}(?>\\w++) login/"')
    assert p2.compiled().search("user mary login failed")
    assert not p2.compiled().search("user  login failed")
    with pytest.raises(RuleParseError):
        translate_pcre('"/recur(?R)sive/"')


def test_meta_content_var_expansion():
    rs = compile_ruleset(
        'var USERS mary,frank\n'
        'alert syslog any any -> any any (msg:"m"; '
        'meta_content:"user %sagan% login",$USERS; sid:6;)')
    assert rs.rules[0].meta_contents[0].alternatives == (
        "user mary login", "user frank login")


def test_after_threshold_xbits_parse():
    rs = compile_ruleset_from_dir(FIXTURES)
    r19 = rs.by_sid(5000119)
    assert r19.after.tracks == ("by_src",)
    assert (r19.after.count, r19.after.seconds) == (3, 300)
    r20 = rs.by_sid(5000120)
    assert r20.threshold.ttype == "limit" and r20.threshold.count == 2
    r21 = rs.by_sid(5000121)
    assert r21.xbits[0].action == "set" and r21.xbits[0].expire == 300
    r22 = rs.by_sid(5000122)
    assert r22.xbits[0].action == "isset"
    r23 = rs.by_sid(5000123)
    assert r23.alert_time.days == frozenset({1, 2, 3, 4, 5})
    assert (r23.alert_time.start, r23.alert_time.end) == (800, 1700)


def test_classtype_priority_join():
    rs = compile_ruleset_from_dir(FIXTURES)
    assert rs.by_sid(5000119).priority == 1      # brute-force → 1
    assert rs.by_sid(5000104).priority == 3      # not-suspicious → 3


def test_glob_to_regex():
    # Wildcard (src/util.c:1069)
    assert re.match(glob_to_regex("web*"), "webapp")
    assert re.match(glob_to_regex("web*"), "web")
    assert not re.match(glob_to_regex("web*"), "aweb")
    assert re.match(glob_to_regex("s?hd"), "sshd")


def test_content_window_reference_quirks():
    """engine.c:502-558: depth keeps depth+1 chars; distance anchors to the
    previous content's depth (not match position)."""
    msg = "0123456789abcdefghij"
    class S:  # minimal spec
        offset = 0; depth = 0; distance = 0; within = 0
    s = S(); s.offset = 10
    assert content_window(msg, s, 0) == "abcdefghij"
    s = S(); s.depth = 4
    assert content_window(msg, s, 0) == "01234"          # depth+1 chars
    s = S(); s.distance = 2
    assert content_window(msg, s, 5) == msg[8:]          # prev_depth+dist+1
    s = S(); s.distance = 2; s.within = 3
    assert content_window(msg, s, 5) == msg[8:11]
    s = S(); s.offset = 100
    assert content_window(msg, s, 0) == ""               # offset > len


def test_unknown_option_rejected():
    with pytest.raises(RuleParseError):
        parse_rule('alert syslog any any -> any any (msg:"m"; bogus:1; sid:7;)')


def test_cidr_and_ip_int_v4_mapped():
    lo, hi = cidr_to_range("10.0.0.0/8")
    assert lo <= ip_to_int("10.255.0.1") <= hi
    assert not (lo <= ip_to_int("11.0.0.1") <= hi)


def test_flexbit_option_parsing():
    from sagan_spark.rules.compiler import compile_ruleset
    rs = compile_ruleset(
        'alert syslog any any -> any any (msg:"m"; content:"x"; '
        'flexbits: set,fb,300; '
        'flexbits: isset,reverse_p,fb; '
        'flexbits: count,by_dst,lt 9; sid:1;)')
    fbs = rs.rules[0].flexbits
    assert (fbs[0].action, fbs[0].name, fbs[0].timeout) == ("set", "fb", 300)
    assert (fbs[1].action, fbs[1].direction) == ("isset", "reverse_p")
    assert (fbs[2].action, fbs[2].direction, fbs[2].count_op,
            fbs[2].count_n) == ("count", "by_dst", "lt", 9)


def test_flexbit_bad_inputs_rejected():
    import pytest

    from sagan_spark.rules.compiler import RuleParseError, compile_ruleset
    for bad in ("flexbits: isset,sideways,fb",
                "flexbits: count,both,gt 1",       # count is by_src|by_dst
                "flexbits: count,by_src,ge 1",
                "flexbits: bogus,fb,1"):
        with pytest.raises(RuleParseError):
            compile_ruleset(
                f'alert syslog any any -> any any (msg:"m"; content:"x"; '
                f'{bad}; sid:1;)')


def test_zeek_intel_and_country_code_parsing():
    from sagan_spark.rules.compiler import compile_ruleset
    rs = compile_ruleset(
        'alert syslog any any -> any any (msg:"m"; content:"x"; '
        'zeek-intel: both_ipaddr, domain, url; '
        'country_code: track by_dst, is [CN,RU, hk]; sid:1;)')
    r = rs.rules[0]
    assert r.intel == ("both_ipaddr", "domain", "url")
    assert (r.geoip_track, r.geoip_is, r.geoip_codes) == \
        ("by_dst", True, ("CN", "RU", "HK"))


def test_intel_and_geoip_loaders():
    from sagan_spark.rules.compiler import load_geoip, load_intel
    sets = load_intel("1.2.3.4\tIntel::ADDR\tf\n"
                      "EvIl.example\tIntel::DOMAIN\tf\n"
                      "a@b.example\tIntel::EMAIL\tf\n")
    assert sets["addr"] == ("1.2.3.4",)
    assert sets["domain"] == ("evil.example",)   # lowered for stristr
    assert sets["email"] == ("a@b.example",)
    geo = load_geoip("10.0.0.0/8,us\n# comment\n1.1.1.1,AU\n")
    assert [g[2] for g in geo] == ["AU", "US"]   # sorted by range


def test_flexbit_direction_ladder_matches_reference():
    """flexbit_entry_matches vs the memcmp ladder of
    Flexbit_Condition_MMAP (flexbit-mmap.c:104-320) — hand-derived
    truth table.  Entry: A:10 -> B:20; the shared helper is used by BOTH
    engines, so only a direct unit test can falsify it."""
    from sagan_spark.rules.model import flexbit_entry_matches as m
    e = ("A", "B", 10, 20)  # stored src, dst, sport, dport

    def chk(direction, cur, want):
        assert m(direction, *e, *cur) is want, (direction, cur)

    chk("none", ("X", "Y", 1, 2), True)
    chk("both", ("A", "B", 1, 2), True)
    chk("both", ("A", "C", 1, 2), False)
    chk("by_src", ("A", "Z", 1, 2), True)
    chk("by_src", ("B", "A", 1, 2), False)
    chk("by_dst", ("Z", "B", 1, 2), True)
    chk("reverse", ("B", "A", 1, 2), True)      # mmap.c:168-180
    chk("reverse", ("A", "B", 1, 2), False)
    chk("src_xbitdst", ("B", "Z", 1, 2), True)  # e.dst == c.src
    chk("src_xbitdst", ("A", "Z", 1, 2), False)
    chk("dst_xbitsrc", ("Z", "A", 1, 2), True)  # e.src == c.dst
    chk("dst_xbitsrc", ("Z", "B", 1, 2), False)
    chk("both_p", ("A", "B", 10, 20), True)
    chk("both_p", ("A", "B", 10, 21), False)
    chk("by_src_p", ("A", "Z", 10, 99), True)   # sport must match
    chk("by_src_p", ("A", "Z", 11, 20), False)
    chk("by_dst_p", ("Z", "B", 99, 20), True)   # dport must match
    chk("by_dst_p", ("Z", "B", 99, 21), False)
    chk("reverse_p", ("B", "A", 20, 10), True)  # ports swapped
    chk("reverse_p", ("B", "A", 10, 20), False)
    chk("src_xbitdst_p", ("B", "Z", 20, 99), True)   # e.dport == c.sport
    chk("src_xbitdst_p", ("B", "Z", 21, 99), False)
    chk("dst_xbitsrc_p", ("Z", "A", 99, 10), True)   # e.sport == c.dport
    chk("dst_xbitsrc_p", ("Z", "A", 99, 11), False)


def test_regex_required_literal():
    from sagan_spark.match import _regex_required_literal as lit
    assert lit(r"sshd\[[0-9]+\]: .*overflow") == "sshd["
    assert lit(r"^Accepted password for \S+") == "Accepted password for "
    assert lit(r"abcd|efgh") == ""          # top-level alternation
    assert lit(r"abc(d|e)f") == "abc"       # group-internal is fine
    assert lit(r"fo?obar") == "f"           # optional char dropped
    assert lit(r"a{0,2}bcd") == ""          # counted char dropped
    assert lit(r"(file system full|no space)") == ""
    assert lit(r"\d+ failures") == ""       # class shorthand leads


def test_last_present_gate_wins_quirk():
    """engine.c:401-485: when several gate keywords are present on one
    rule, only the last-parsed gate applies (program < facility < level <
    tag < syspri in _RuleProgram's evaluation order)."""
    from sagan_spark.match import _RuleProgram
    rs = compile_ruleset(
        'alert syslog any any -> any any (msg:"q"; program: click*; '
        'facility: user|tool; content:"x"; classtype:misc-attack; '
        'sid:1; rev:1;)')
    prog = _RuleProgram(0, rs.rules[0])
    assert prog.gate == ("role_in", frozenset({"user", "tool"}))

    rs2 = compile_ruleset(
        'alert syslog any any -> any any (msg:"q"; facility: user; '
        'syslog_level: system; content:"x"; classtype:misc-attack; '
        'sid:2; rev:1;)')
    prog2 = _RuleProgram(0, rs2.rules[0])
    assert prog2.gate == ("role_in", frozenset({"system"}))
