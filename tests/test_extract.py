"""parse_* extractor tests against the encoding zoo
(/root/reference/src/parsers/ip.c:32-61)."""

from sagan_spark.extract import (
    blacklist_hit,
    detect_proto,
    normalize_message,
    parse_hash,
    parse_ip_cache,
    parse_proto_program,
)
from sagan_spark.rules.compiler import load_blacklist


def ips(msg):
    return [(h.ip, h.port) for h in parse_ip_cache(msg)]


def test_bare_ip():
    assert ips("Invalid login from 12.145.241.50") == [("12.145.241.50", 514)]


def test_trailing_period():
    assert ips("bad host 192.168.2.1. denied") == [("192.168.2.1", 514)]


def test_ip_colon_port():
    assert ips("connection from 192.168.2.1:1234") == [("192.168.2.1", 1234)]


def test_ip_hash_port():
    assert ips("src 192.168.2.1#1234 end") == [("192.168.2.1", 1234)]


def test_port_suffix_forms():
    assert ips("x 192.168.2.1 port 1234 y") == [("192.168.2.1", 1234)]
    assert ips("x 192.168.2.1 source port 1234") == [("192.168.2.1", 1234)]
    assert ips("x 192.168.2.1 source port: 1234") == [("192.168.2.1", 1234)]
    assert ips("x 192.168.2.1 destination port 99") == [("192.168.2.1", 99)]
    assert ips("x 192.168.2.1 client port: 7") == [("192.168.2.1", 7)]


def test_inet_prefix():
    assert ips("inet#192.168.2.1 blocked") == [("192.168.2.1", 514)]


def test_ipv6_forms():
    assert ips("from fe80::b614:89ff:fe11:5e24 up") == \
        [("fe80::b614:89ff:fe11:5e24", 514)]
    # [v6]:port — brackets blanked by the sanitizer (ip.c:131-151)
    assert ips("x [fe80::b614:89ff:fe11:5e24]:80 y") == \
        [("fe80::b614:89ff:fe11:5e24", 80)]


def test_multiple_ips_ordered():
    got = ips("fwd 10.0.0.5 port 2222 to 172.16.1.2:443")
    assert got == [("10.0.0.5", 2222), ("172.16.1.2", 443)]


def test_not_an_ip():
    assert ips("version 1.2.3.4.5 and 300.1.1.1 nope") == []


def test_proto_detection():
    assert detect_proto("tcp connection established") == "tcp"
    assert detect_proto("ICMP unreachable") == "icmp"
    assert detect_proto("no protocol here") == ""
    hits = parse_ip_cache("tcp connect 1.2.3.4:80")
    assert hits[0].proto == "tcp"


def test_parse_hash():
    md5 = "d41d8cd98f00b204e9800998ecf8427e"
    assert parse_hash(f"md5={md5}", "md5") == md5
    assert parse_hash(f"found {md5} infile", "md5") == md5
    assert parse_hash("sha yes " + "a" * 40, "sha1") == "a" * 40
    assert parse_hash("sha256 " + "B" * 64, "sha256") == "b" * 64
    assert parse_hash("not a hash deadbeef", "md5") == ""


def test_parse_proto_program():
    assert parse_proto_program("sshd") == "tcp"
    assert parse_proto_program("openssh-sshd-2") == "tcp"
    assert parse_proto_program("named-dns") == "udp"
    assert parse_proto_program("mystery") == ""


def test_normalize_rulebase():
    n = normalize_message("login failed for user alice from 10.1.2.3:9999")
    assert n["username"] == "alice"
    assert n["src_ip"] == "10.1.2.3" and n["src_port"] == "9999"


def test_blacklist_hit():
    ranges = tuple(load_blacklist("203.0.113.0/24\n198.51.100.7\n"))
    assert blacklist_hit("203.0.113.55", ranges)
    assert blacklist_hit("198.51.100.7", ranges)
    assert not blacklist_hit("198.51.100.8", ranges)
    assert not blacklist_hit("conv-00000001", ranges)  # host fallback, not IP


def test_liblognorm_rulebase_translation():
    """Verbatim liblognorm v1 DSL loads unchanged: %field:type% samples
    translate to anchored named-group regexes with the
    Normalize_Liblognorm field mapping (liblognormalize.c:154-260)."""
    from sagan_spark.extract import load_normalize_rulebase, normalize_message
    rb = "\n".join([
        "# stock Sagan-style rulebase",
        "rule=:%-:word% login from %src-ip:ipv4% port %src-port:number%"
        " user %username:word%",
        "rule=login:quarantine %hash-md5:word% at %-:rest%",
        "prefix=%-:word%: ",
        "rule=:connect to %dst-ip:ipv4%:%dst-port:number% %-:rest%",
    ])
    pats = load_normalize_rulebase(rb)
    assert len(pats) == 3 and all(p.startswith("^") for p in pats)
    got = normalize_message(
        "sshd login from 10.1.2.3 port 2222 user root", pats)
    assert got == {"src_ip": "10.1.2.3", "src_port": "2222",
                   "username": "root"}
    got = normalize_message(
        "quarantine 0123456789abcdef0123456789abcdef at /tmp x", pats)
    assert got == {"md5": "0123456789abcdef0123456789abcdef"}
    # prefix= applies to the rules after it
    got = normalize_message("kernel: connect to 10.9.9.9:443 ok", pats)
    assert got == {"dst_ip": "10.9.9.9", "dst_port": "443"}
    # whole-message consumption (ln_normalize leftover → no fields)
    assert normalize_message(
        "sshd login from 10.1.2.3 port 2222 user root EXTRA", pats) == {}


def test_liblognorm_char_to_and_literal_percent():
    from sagan_spark.extract import load_normalize_rulebase, normalize_message
    rb = ("rule=:cpu at 99%% user=%username:char-to:,%, done %-:rest%")
    pats = load_normalize_rulebase(rb)
    got = normalize_message("cpu at 99% user=alice, done now", pats)
    assert got == {"username": "alice"}


def test_liblognorm_unsupported_type_raises():
    import pytest
    from sagan_spark.extract import load_normalize_rulebase
    with pytest.raises(ValueError):
        load_normalize_rulebase("rule=: %f:no-such-type%")
