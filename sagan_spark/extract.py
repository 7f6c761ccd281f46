"""Field extraction — the ``parse_src_ip / parse_dst_ip / parse_port /
parse_hash / parse_proto / normalize`` operator family (SURVEY §2.3).

Re-implements, from scratch, the semantics of the reference parsers:

* IP/port cache & encoding zoo — /root/reference/src/parsers/ip.c:32-61
  (sanitizer char list ip.c:128-156, port-suffix forms ip.c:289-413)
* proto keyword detection — ip.c:209-242
* hash extraction — src/parsers/hash.c:42-174
* program→proto map — src/parsers/proto.c:85-109 + src/protocol-map.c
* liblognorm-style ``normalize`` — named-group regex rulebase analog of
  src/liblognormalize.c:106-320

These are pure-Python and shared by BOTH engines: the pure-Python oracle
calls them row-at-a-time; the Spark engine calls them *lazily* — only for
rows that already matched a rule requesting extraction (the reference is
equally lazy: extraction happens post-content-match, engine.c:709-962, and
the per-event cache guarantees at most one parse per event,
engine.c:845-860).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

MAX_PARSE_IP = 30        # src/sagan-defs.h:122
DEFAULT_PORT = 514       # config->default_port analog (etc/sagan.yaml sagan_port)
DEFAULT_PROTO = "udp"    # config default proto

# Characters the reference blanks out before tokenizing (ip.c:131-151).
_SANITIZE = str.maketrans({c: " " for c in "\"()[]<>{},/@=-!|_+&%$~^'"})

_IPV4_RE = re.compile(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")
_HEXGROUP_RE = re.compile(r"^[0-9a-fA-F:]+$")
_PORT_RE = re.compile(r"^\d{1,5}$")

_HASH_LENGTHS = {"md5": 32, "sha1": 40, "sha256": 64}
_HASH_RE = {k: re.compile(rf"^[0-9a-fA-F]{{{n}}}$")
            for k, n in _HASH_LENGTHS.items()}

_PROTO_WORDS = {"tcp": "tcp", "udp": "udp", "icmp": "icmp"}  # ip.c:209-242


def _valid_ipv4(tok: str) -> bool:
    m = _IPV4_RE.match(tok)
    return bool(m) and all(int(g) <= 255 for g in m.groups())


def _valid_ipv6(tok: str) -> bool:
    if tok.count(":") < 2 or not _HEXGROUP_RE.match(tok):
        return False
    import ipaddress
    try:
        ipaddress.IPv6Address(tok)
        return True
    except ValueError:
        return False


@dataclass(frozen=True)
class IpHit:
    ip: str
    port: int
    proto: str


def parse_ip_cache(message: str,
                   default_port: int = DEFAULT_PORT) -> list[IpHit]:
    """Build the ordered IP lookup cache for one message — the analog of
    ``Parse_IP`` (ip.c:88-992).  Handles the documented encoding zoo
    (ip.c:32-61): bare IP, trailing period, ``ip:port``, ``ip#port``,
    ``[ip]:port`` (brackets are blanked by the sanitizer, leaving a
    dangling ``:port`` token), ``inet#ip``, and the
    ``port / source port[:] / destination port[:] / client port[:] N``
    suffix forms (ip.c:289-413).  Proto keywords tcp/udp/icmp are detected
    anywhere in the message (ip.c:209-242) and stamped on every hit, like
    the reference's single per-message proto."""
    tokens = message.translate(_SANITIZE).split()
    hits: list[IpHit] = []
    proto = ""
    i = 0
    n = len(tokens)
    while i < n and len(hits) < MAX_PARSE_IP:
        tok = tokens[i]
        low = tok.lower()
        if low in _PROTO_WORDS:
            proto = _PROTO_WORDS[low]
            i += 1
            continue
        if tok.startswith("inet#"):           # inet#192.168.2.1 (ip.c:55)
            tok = tok[5:]
        ip: str | None = None
        port = 0
        if tok.endswith("."):                 # trailing period (ip.c:38)
            tok = tok[:-1]
        if ":" in tok and tok.count(":") == 1:
            left, _, right = tok.partition(":")     # 1.2.3.4:5678
            if _valid_ipv4(left) and _PORT_RE.match(right or ""):
                ip, port = left, int(right)
        elif "#" in tok:
            left, _, right = tok.partition("#")     # ip#port (ip.c:44)
            if (_valid_ipv4(left) or _valid_ipv6(left)) and \
                    _PORT_RE.match(right or ""):
                ip, port = left, int(right)
        if ip is None and _valid_ipv4(tok):
            ip = tok
        if ip is None and _valid_ipv6(tok):
            ip = tok
        if ip is None:
            i += 1
            continue
        # port from following tokens --------------------------------------
        j = i + 1
        if port == 0 and j < n:
            nxt = tokens[j].lower()
            if nxt.startswith(":") and _PORT_RE.match(nxt[1:]):
                # "[ip]:80" sanitized into "ip :80" (ip.c:58)
                port = int(nxt[1:])
                j += 1
            elif "port" in nxt:                     # "ip port 1234"
                if j + 1 < n and _PORT_RE.match(tokens[j + 1].rstrip(":")):
                    port = int(tokens[j + 1].rstrip(":"))
                    j += 2
            elif nxt in ("source", "destination", "desitnation", "client"):
                # "ip source port[:] 1234" (ip.c:321-413; typo kept)
                if j + 1 < n and "port" in tokens[j + 1].lower():
                    k = j + 2
                    if k < n and _PORT_RE.match(tokens[k].rstrip(":")):
                        port = int(tokens[k].rstrip(":"))
                        j = k + 1
        if port == 0:
            port = default_port                     # ip.c:304-310
        hits.append(IpHit(ip=ip, port=port, proto=proto))
        i = max(j, i + 1)
    if proto:   # proto token may appear after the IP; restamp all hits
        hits = [IpHit(ip=h.ip, port=h.port, proto=proto) for h in hits]
    return hits


def detect_proto(message: str) -> str:
    """tcp/udp/icmp keyword detection (ip.c:209-242)."""
    for tok in message.translate(_SANITIZE).split():
        low = tok.lower()
        if low in _PROTO_WORDS:
            return _PROTO_WORDS[low]
    return ""


def parse_hash(message: str, kind: str) -> str:
    """First token that is exactly 32/40/64 hex chars
    (Parse_Hash, src/parsers/hash.c:42-174)."""
    pat = _HASH_RE[kind]
    for tok in message.translate(_SANITIZE).split():
        tok = tok.strip(".:;")
        if pat.match(tok):
            return tok.lower()
    return ""


# ---------------------------------------------------------------------------
# program → proto map (src/protocol-map.c, src/parsers/proto.c:85-109)
# ---------------------------------------------------------------------------

DEFAULT_PROGRAM_PROTO_MAP: tuple[tuple[str, str], ...] = (
    # substring-of-program → proto, scanned in order (proto.c:93-104)
    ("sshd", "tcp"),
    ("telnet", "tcp"),
    ("ftp", "tcp"),
    ("http", "tcp"),
    ("web", "tcp"),
    ("smtp", "tcp"),
    ("dns", "udp"),
    ("ntp", "udp"),
    ("snmp", "udp"),
    ("ping", "icmp"),
)


def parse_proto_program(program: str,
                        proto_map=DEFAULT_PROGRAM_PROTO_MAP) -> str:
    low = (program or "").lower()
    for needle, proto in proto_map:
        if needle in low:
            return proto
    return ""


# ---------------------------------------------------------------------------
# "normalize" — grok-style named-group rulebase
# (liblognorm analog, src/liblognormalize.c:106-320)
# ---------------------------------------------------------------------------

# Fields the reference merges from liblognorm (engine.c:709-838).
NORMALIZE_FIELDS = ("src_ip", "dst_ip", "src_port", "dst_port", "username",
                    "md5", "sha1", "sha256")

DEFAULT_NORMALIZE_RULEBASE: tuple[str, ...] = (
    # applied in order; first match per field wins
    r"login (?:failed|succeeded) for user (?P<username>\S+)",
    r"user (?P<username>\S+) login",
    r"from (?P<src_ip>\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})"
    r"(?::(?P<src_port>\d{1,5}))?",
    r"to (?P<dst_ip>\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})"
    r"(?::(?P<dst_port>\d{1,5}))?",
    r"md5=(?P<md5>[0-9a-fA-F]{32})",
    r"sha1=(?P<sha1>[0-9a-fA-F]{40})",
    r"sha256=(?P<sha256>[0-9a-fA-F]{64})",
)

_COMPILED_RULEBASE = tuple(re.compile(p, re.I)
                           for p in DEFAULT_NORMALIZE_RULEBASE)


# liblognorm v1 field types → regex fragments (the public rulebase DSL
# that src/liblognormalize.c:64-104 loads via ln_loadSamples; the subset
# below covers the parser types stock Sagan rulebases use)
_LN_TYPES = {
    "word": r"\S+",
    "alpha": r"[A-Za-z]+",
    "number": r"\d+",
    "float": r"\d+(?:\.\d+)?",
    "hexnumber": r"0x[0-9a-fA-F]+",
    "ipv4": r"\d{1,3}(?:\.\d{1,3}){3}",
    "ipv6": r"[0-9a-fA-F:]*:[0-9a-fA-F:.]+",
    "mac48": r"[0-9a-fA-F]{2}(?:[:-][0-9a-fA-F]{2}){5}",
    "whitespace": r"\s+",
    "quoted-string": r'"[^"]*"',
    "op-quoted-string": r'(?:"[^"]*"|\S+)',
    "rest": r".*",
}

# liblognorm field names → this engine's NORMALIZE_FIELDS (the json keys
# Normalize_Liblognorm reads, src/liblognormalize.c:154-260)
_LN_FIELD_MAP = {
    "src-ip": "src_ip", "dst-ip": "dst_ip",
    "src-port": "src_port", "dst-port": "dst_port",
    "username": "username",
    "hash-md5": "md5", "hash-sha1": "sha1", "hash-sha256": "sha256",
}

_LN_PCT_RE = re.compile(r"%([^%:]*)(?::([^%:]+))?(?::([^%]*))?%")


def translate_liblognorm_rule(body: str) -> str:
    """One ``rule=`` body → an anchored named-group regex.  liblognorm's
    ln_normalize only succeeds when a sample consumes the WHOLE message
    (leftover bytes → unparsed-data → Sagan gets no fields), hence ^…$.
    ``%-:type%`` discards; field names outside the Normalize_Liblognorm
    read-set match without capturing; ``%%`` is a literal percent."""
    out = ["^"]
    pos = 0
    for m in _LN_PCT_RE.finditer(body):
        out.append(re.escape(body[pos:m.start()]))
        pos = m.end()
        name, typ, extra = m.group(1), m.group(2), m.group(3)
        if name == "" and typ is None:       # '%%' literal percent
            out.append("%")
            continue
        if typ is None:
            raise ValueError(f"liblognorm field needs a type: {body!r}")
        if typ == "char-to":
            frag = f"[^{re.escape(extra or ':')}]+"
        elif typ == "char-sep":
            frag = f"[^{re.escape(extra or ':')}]*"
        else:
            frag = _LN_TYPES.get(typ)
            if frag is None:
                raise ValueError(f"unsupported liblognorm type {typ!r} "
                                 f"in {body!r}")
        mapped = _LN_FIELD_MAP.get(name)
        if name == "-" or mapped is None:
            out.append(f"(?:{frag})")
        else:
            out.append(f"(?P<{mapped}>{frag})")
    out.append(re.escape(body[pos:]))
    out.append("$")
    return "".join(out)


def load_liblognorm_rulebase(text: str) -> tuple[str, ...]:
    """Verbatim liblognorm v1 ``.rulebase`` loader: ``rule=[tags]: body``
    lines (tags ignored — Sagan doesn't use them), ``prefix=`` prepends to
    subsequent rule bodies, comments/blank lines skipped."""
    out = []
    prefix = ""
    for raw in text.splitlines():
        s = raw.strip()
        if not s or s.startswith("#"):
            continue
        ls = raw.lstrip()               # sample text is verbatim after the
        if ls.startswith("prefix="):    # '=' — trailing spaces significant
            prefix = ls[len("prefix="):]
            continue
        if ls.startswith("rule="):
            rest = ls[len("rule="):]
            tags, sep, body = rest.partition(":")
            if not sep or "%" in tags:
                # the tag section of 'rule=[tags]:body' can never contain
                # '%'; a missing tag colon (e.g. 'rule=%f:t%…') would
                # otherwise silently truncate the body (the partition eats
                # everything up to the colon INSIDE the field spec) — fail
                # fast like the unsupported-type path does
                raise ValueError(
                    f"rule= line missing the tag colon: {raw!r}")
            pattern = translate_liblognorm_rule(prefix + body)
            re.compile(pattern, re.I)   # validate on the driver
            out.append(pattern)
    return tuple(out)


def load_normalize_rulebase(text: str) -> tuple[str, ...]:
    """File-driven rulebase (src/liblognormalize.c:64-104 loads rulebase
    paths from sagan.yaml).  Two accepted formats, auto-detected:

    * verbatim liblognorm v1 ``rule=…`` DSL (%field:type% samples) — a
      stock Sagan ``.rulebase`` file loads unchanged;
    * one named-group regex per line (this engine's native format).

    Patterns apply in order, first match per field wins.  Empty/comment
    lines skipped; each pattern validated at load."""
    if re.search(r"(?m)^\s*(?:rule|prefix)=", text):
        return load_liblognorm_rulebase(text)
    out = []
    for ln in text.splitlines():
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        re.compile(ln, re.I)   # validate on the driver
        out.append(ln)
    return tuple(out)


def compile_rulebase(rulebase: tuple[str, ...] | None):
    """Patterns → compiled regexes (default rulebase when None/empty)."""
    if not rulebase:
        return _COMPILED_RULEBASE
    return tuple(re.compile(p, re.I) for p in rulebase)


def normalize_message(message: str, rulebase=None) -> dict[str, str]:
    """Apply the named-group rulebase; returns only captured fields.
    Precedence across extraction sources is handled by the caller
    (engine.c:842-846: normalize > parse_* > host fallback)."""
    compiled = compile_rulebase(rulebase)
    out: dict[str, str] = {}
    for rx in compiled:
        m = rx.search(message)
        if not m:
            continue
        for k, v in m.groupdict().items():
            if v is not None and k not in out:
                out[k] = v
    return out


# ---------------------------------------------------------------------------
# one-shot extraction record (what the engines consume)
# ---------------------------------------------------------------------------

def intel_hit(kinds: tuple[str, ...], ip_src: str, ip_dst: str,
              message: str, intel_sets: dict) -> bool:
    """Zeek intel membership gate (engine.c:1396-1459): lookups run in the
    listed order and short-circuit on first hit.  ADDR lookups are exact
    IP matches (Sagan_BroIntel_IPADDR); every other type is a
    case-insensitive substring of the message (Sagan_stristr, e.g.
    bro-intel.c Sagan_BroIntel_DOMAIN).  ``all_ipaddr`` scans every IP in
    the message's parse cache (Sagan_BroIntel_IPADDR_All)."""
    if not intel_sets:
        return False
    addr = intel_sets.get("addr", ())
    low_msg = None
    for kind in kinds:
        if kind == "src_ipaddr":
            if ip_src in addr:
                return True
        elif kind == "dst_ipaddr":
            if ip_dst in addr:
                return True
        elif kind == "both_ipaddr":
            if ip_src in addr or ip_dst in addr:
                return True
        elif kind == "all_ipaddr":
            if addr and any(h.ip in addr
                            for h in parse_ip_cache(message)):
                return True
        else:
            needles = intel_sets.get(kind, ())
            if needles:
                if low_msg is None:
                    low_msg = message.lower()
                if any(n in low_msg for n in needles):
                    return True
    return False


_NOTROUTABLE_NETS = None


def _is_notroutable(addr) -> bool:
    """The reference's exact notroutable table (util.c is_notroutable):
    RFC1918 (10/8, 172.16/12, 192.168/16), localhost, multicast,
    broadcast, IPv6 link-local/ULA/loopback.  Deliberately NOT Python's
    broader ``is_global`` complement — TEST-NET etc. are routable to the
    reference."""
    global _NOTROUTABLE_NETS
    import ipaddress
    if _NOTROUTABLE_NETS is None:
        _NOTROUTABLE_NETS = tuple(ipaddress.ip_network(n) for n in (
            "10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16",
            "127.0.0.0/8", "224.0.0.0/4", "255.255.255.255/32",
            "ff00::/8", "fe80::/10", "fc00::/7", "::1/128"))
    return any(addr in n for n in _NOTROUTABLE_NETS
               if n.version == addr.version)


def geoip_country(ip: str,
                  ranges: tuple[tuple[int, int, str], ...]) -> str | None:
    """IP → ISO3166 country via bisect over the broadcast interval table
    (the mmdb point-lookup analog, src/geoip.c:138-208).  None == the
    reference's GEOIP_SKIP (non-routable / not in DB, geoip.c:112-166)."""
    if not ip or not ranges:
        return None
    from bisect import bisect_right

    from .rules.compiler import ip_to_int
    import ipaddress
    try:
        addr = ipaddress.ip_address(ip)
    except ValueError:
        return None
    if _is_notroutable(addr):
        return None               # is_notroutable skip (geoip.c:112-120)
    v = ip_to_int(ip)
    idx = bisect_right(ranges, (v, float("inf"), "")) - 1
    if idx >= 0 and ranges[idx][0] <= v <= ranges[idx][1]:
        return ranges[idx][2]
    return None


def geoip_pass(rule, ip_src: str, ip_dst: str,
               ranges: tuple[tuple[int, int, str], ...]) -> bool:
    """country_code gate (engine.c:1161-1225): ``is`` passes on HIT,
    ``isnot`` passes on MISS; SKIP (no lookup possible) always blocks
    because geoip2_isset stays false (engine.c:1170-1171)."""
    ip = ip_src if rule.geoip_track == "by_src" else ip_dst
    cc = geoip_country(ip, ranges)
    if cc is None:
        return False
    hit = cc in rule.geoip_codes
    return hit if rule.geoip_is else not hit


def blacklist_hit(ip: str, ranges: tuple[tuple[int, int], ...]) -> bool:
    """CIDR-range membership via bisect over sorted inclusive ranges —
    the broadcast analog of ``is_inrange`` (src/util.c:564) used by the
    blacklist processor (src/processors/blacklist.c:244-297)."""
    if not ip or not ranges:
        return False
    from bisect import bisect_right

    from .rules.compiler import ip_to_int
    try:
        v = ip_to_int(ip)
    except ValueError:
        return False
    idx = bisect_right(ranges, (v, float("inf"))) - 1
    return idx >= 0 and ranges[idx][0] <= v <= ranges[idx][1]
