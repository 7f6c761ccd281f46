"""Row-level semantics shared by the oracle and the Spark matcher: field
extraction per rule, header flow check, alert_time window, correlation key
construction.

These run only on *matched* rows (the reference is equally lazy —
extraction happens post-content-match, engine.c:709-962); the hot path
(content/pcre/meta matching over every row) is fully vectorized in
match.py and row-at-a-time in oracle/engine.py, independently.
"""

from __future__ import annotations

from datetime import datetime, timezone

from .extract import (
    DEFAULT_PORT,
    DEFAULT_PROTO,
    detect_proto,
    normalize_message,
    parse_hash,
    parse_ip_cache,
    parse_proto_program,
)
from .rules.compiler import ip_to_int
from .rules.model import CompiledRule


class PrimCache:
    """Per-row primitive memo — the analog of the reference's parse-once
    IP cache (engine.c:845-860, ip.c:28-30): each primitive runs at most
    once per event no matter how many rules request it."""

    __slots__ = ("text", "tool", "_ip", "_proto", "_hash", "_norm")

    def __init__(self, text: str, tool: str):
        self.text = text
        self.tool = tool
        self._ip = None
        self._proto = None
        self._hash: dict = {}
        self._norm = None

    def ip_cache(self, default_port: int):
        if self._ip is None:
            self._ip = parse_ip_cache(self.text, default_port)
        return self._ip

    def proto(self) -> str:
        if self._proto is None:
            self._proto = detect_proto(self.text)
        return self._proto

    def hash(self, kind: str) -> str:
        if kind not in self._hash:
            self._hash[kind] = parse_hash(self.text, kind)
        return self._hash[kind]

    def norm(self) -> dict:
        if self._norm is None:
            self._norm = normalize_message(self.text)
        return self._norm


def extract_for_rule(rule: CompiledRule, conv_id: str, pc: PrimCache,
                     default_port: int = DEFAULT_PORT,
                     default_proto: str = DEFAULT_PROTO) -> dict:
    """Extraction with reference precedence (engine.c:842-1045):
    normalize < parse_* < host fallback; defaults fill last."""
    out = {"ip_src": "", "src_port": 0, "ip_dst": "", "dst_port": 0,
           "proto": "", "username": "", "hash": ""}
    if rule.normalize:
        norm = pc.norm()
        out["ip_src"] = norm.get("src_ip", "")
        out["ip_dst"] = norm.get("dst_ip", "")
        out["src_port"] = int(norm.get("src_port") or 0)
        out["dst_port"] = int(norm.get("dst_port") or 0)
        out["username"] = norm.get("username", "")
    cache = None
    if rule.parse_src_ip or rule.parse_dst_ip or rule.parse_port:
        cache = pc.ip_cache(default_port)
    if rule.parse_src_ip and cache and len(cache) >= rule.parse_src_ip:
        hit = cache[rule.parse_src_ip - 1]
        out["ip_src"], out["src_port"] = hit.ip, hit.port
        if hit.proto:
            out["proto"] = hit.proto
    if rule.parse_dst_ip and cache and len(cache) >= rule.parse_dst_ip:
        hit = cache[rule.parse_dst_ip - 1]
        out["ip_dst"], out["dst_port"] = hit.ip, hit.port
        if hit.proto:
            out["proto"] = hit.proto
    if rule.parse_port and cache:
        out["src_port"] = cache[0].port
    if rule.parse_hash:
        out["hash"] = pc.hash(rule.parse_hash)
    if rule.parse_proto:
        p = pc.proto()
        if p:
            out["proto"] = p
    if rule.parse_proto_program and not out["proto"]:
        out["proto"] = parse_proto_program(pc.tool)
    # fallback addressing: syslog_host == conv_id (engine.c:967-1045)
    if not out["ip_src"]:
        out["ip_src"] = conv_id
    if not out["ip_dst"]:
        out["ip_dst"] = conv_id
    if not out["src_port"]:
        out["src_port"] = default_port
    if not out["dst_port"]:
        out["dst_port"] = default_port
    if not out["proto"]:
        out["proto"] = default_proto
    return out


def flow_pass(rule: CompiledRule, ex: dict) -> bool:
    """Header targeting (src/flow.c:49-427) with AllAny fast-track
    (rules.c:303-310)."""
    if rule.head.all_any:
        return True

    def ip_int(s: str):
        try:
            return ip_to_int(s)
        except ValueError:
            return None

    s_ip, d_ip = ip_int(ex["ip_src"]), ip_int(ex["ip_dst"])
    s_p, d_p = ex["src_port"], ex["dst_port"]
    h = rule.head
    fwd = (h.src_ip.contains(s_ip) and h.src_port.contains(s_p) and
           h.dst_ip.contains(d_ip) and h.dst_port.contains(d_p))
    if h.direction in ("->", "any"):
        return fwd
    rev = (h.src_ip.contains(d_ip) and h.src_port.contains(d_p) and
           h.dst_ip.contains(s_ip) and h.dst_port.contains(s_p))
    if h.direction == "<-":
        return rev
    return fwd or rev


def alert_time_pass(spec, ts: datetime) -> bool:
    """Check_Time (src/aetas.c:48-150) incl. midnight wrap; UTC.
    Naive timestamps (Arrow batches under a UTC session tz) are UTC."""
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=timezone.utc)
    else:
        ts = ts.astimezone(timezone.utc)
    day = (ts.weekday() + 1) % 7            # tm_wday: Sunday == 0
    cur = ts.hour * 100 + ts.minute
    next_day = spec.start > spec.end
    off_day = day not in spec.days
    prev_ok = ((day - 1) % 7) in spec.days
    if day in spec.days or (prev_ok and next_day):
        if not next_day and not off_day:
            return spec.start <= cur <= spec.end
        if next_day and not off_day:
            return cur >= spec.start or cur <= spec.end
        if next_day and off_day:
            return cur <= spec.end
    return False


def track_key(tracks: tuple[str, ...], ex: dict) -> str:
    """after/threshold state key: the "src|sport|dst|dport|user" subset
    string (after.c:108-110, threshold.c:121-123).  We key on the string
    itself rather than its Djb2 hash — semantically identical, collision-
    free (util.c:1701 is an implementation detail)."""
    src = ex["ip_src"] if "by_src" in tracks else ""
    dst = ex["ip_dst"] if "by_dst" in tracks else ""
    user = ex["username"] if "by_username" in tracks else ""
    sport = ex["src_port"] if "by_srcport" in tracks else 0
    dport = ex["dst_port"] if "by_dstport" in tracks else 0
    return f"{src}|{sport}|{dst}|{dport}|{user}"


def xbit_track_value(track: str, ex: dict) -> str:
    """xbit store key value (Xbit_Return_Tracking_Hash analog,
    src/xbit.c:54-123): src, dst, or the pair."""
    if track == "ip_src":
        return ex["ip_src"]
    if track == "ip_dst":
        return ex["ip_dst"]
    return f"{ex['ip_src']}|{ex['ip_dst']}"
