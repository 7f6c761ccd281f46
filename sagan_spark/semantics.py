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
from .rules.model import CompiledRule, flexbit_entry_matches


class PrimCache:
    """Per-row primitive memo — the analog of the reference's parse-once
    IP cache (engine.c:845-860, ip.c:28-30): each primitive runs at most
    once per event no matter how many rules request it."""

    __slots__ = ("text", "tool", "rulebase", "_ip", "_proto", "_hash",
                 "_norm")

    def __init__(self, text: str, tool: str, rulebase=None):
        self.text = text
        self.tool = tool
        self.rulebase = rulebase or None   # () → default rulebase
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
            self._norm = normalize_message(self.text, self.rulebase)
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


class FlexStore:
    """The flexbit entry store (the mmap array of flexbit-mmap.c) —
    shared by the Spark correlate fold AND the pure-Python oracle.

    Entries are never removed — expiry toggles liveness lazily (the
    Flexbit_Cleanup_MMAP equivalent, flexbit-mmap.c:1468-1494) and the
    name-agnostic, state-agnostic count quirk (flexbit-mmap.c:671-744)
    is preserved via creation-time per-IP counters.

    Scale note: the reference scans the whole mmap array per event
    (flexbit-mmap.c:104-320) — O(entries) per condition, quadratic over
    a stream of set+isset rows.  This store keeps per-(name,src) and
    per-(name,dst) secondary indexes so each direction consults only the
    entries it can match — same tallies bit-for-bit, linear wall.  Index
    lists hold the SAME mutable entry objects as by_name, so unset's
    in-place liveness toggles stay visible everywhere."""

    __slots__ = ("by_name", "by_key", "cnt_src", "cnt_dst",
                 "idx_src", "idx_dst")

    def __init__(self):
        self.by_name: dict[str, list] = {}
        self.by_key: dict[tuple, list] = {}
        self.cnt_src: dict[str, int] = {}
        self.cnt_dst: dict[str, int] = {}
        self.idx_src: dict[tuple, list] = {}
        self.idx_dst: dict[tuple, list] = {}

    # entry layout: [ip_src, ip_dst, src_port, dst_port, expire_at, state]

    def _candidates(self, name, direction, c_src, c_dst):
        """The (superset of) entries this direction can match — chosen by
        which side of the entry the direction compares against the
        current event (flexbit_entry_matches); every candidate is still
        verified by the full direction compare afterwards."""
        if direction in ("by_src", "by_src_p"):        # e_src == c_src
            return self.idx_src.get((name, c_src), ())
        if direction in ("by_dst", "by_dst_p"):        # e_dst == c_dst
            return self.idx_dst.get((name, c_dst), ())
        if direction in ("both", "both_p"):            # exact (src, dst)
            e = self.by_key.get((name, c_src, c_dst))
            return (e,) if e is not None else ()
        if direction in ("reverse", "reverse_p"):      # exact (dst, src)
            e = self.by_key.get((name, c_dst, c_src))
            return (e,) if e is not None else ()
        if direction in ("src_xbitdst", "src_xbitdst_p"):  # e_dst == c_src
            return self.idx_dst.get((name, c_src), ())
        if direction in ("dst_xbitsrc", "dst_xbitsrc_p"):  # e_src == c_dst
            return self.idx_src.get((name, c_dst), ())
        return self.by_name.get(name, ())              # none: any entry

    def condition(self, rule, src, dst, sport, dport, t) -> bool:
        """Flexbit_Condition_MMAP (flexbit-mmap.c:61-670): the final test
        is EXACT equality tally == condition_count, and an isset clause
        increments the tally once per matching live entry with NO break
        (flexbit-mmap.c:116-318,637) — so TWO live entries matching one
        isset clause (same src, two dsts, direction by_src) overcount and
        make the reference return false.  Quirk preserved bit-for-bit."""
        conds = [fb for fb in rule.flexbits
                 if fb.action in ("isset", "isnotset")]
        n_cond = len(conds)
        tally = 0
        for fb in conds:
            if fb.action == "isset":
                for e in self._candidates(fb.name, fb.direction, src, dst):
                    if e[5] and t < e[4] and flexbit_entry_matches(
                            fb.direction, e[0], e[1], e[2], e[3],
                            src, dst, sport, dport):
                        tally += 1
                        if tally > n_cond:
                            # exact early exit: the total only grows, so
                            # it can no longer EQUAL n_cond — the
                            # reference's full-array tally
                            # (flexbit-mmap.c:637) reaches the same
                            # False without the O(live entries) scan
                            return False
            else:
                hit = any(
                    e[5] and t < e[4] and flexbit_entry_matches(
                        fb.direction, e[0], e[1], e[2], e[3],
                        src, dst, sport, dport)
                    for e in self._candidates(fb.name, fb.direction,
                                              src, dst))
                if not hit:
                    tally += 1
        return tally == n_cond

    def count_check(self, rule, src, dst) -> bool:
        """Flexbit_Count_MMAP (flexbit-mmap.c:671-744): entries counted
        regardless of name or state; gt fires on counter > N (the only
        comparator the fork wires); lt/eq follow rules.h:110-112."""
        for fb in rule.flexbits:
            if fb.action != "count":
                continue
            n = (self.cnt_src.get(src, 0) if fb.direction == "by_src"
                 else self.cnt_dst.get(dst, 0))
            if fb.count_op == "gt":
                return n > fb.count_n
            if fb.count_op == "lt":
                return n < fb.count_n
            return n == fb.count_n
        return True

    def apply_sets(self, rule, src, dst, sport, dport, t) -> None:
        """Flexbit_Set_MMAP (flexbit-mmap.c:745-1467): set updates the
        (name, src, dst)-matched entry or creates one; unset toggles
        state=false on direction-matched entries."""
        for fb in rule.flexbits:
            if fb.action == "set":
                key = (fb.name, src, dst)
                e = self.by_key.get(key)
                if e is not None:                 # update (mmap.c:1280-1305)
                    e[2], e[3] = sport, dport
                    e[4], e[5] = t + fb.timeout, True
                else:                             # create (mmap.c:1412-1434)
                    e = [src, dst, sport, dport, t + fb.timeout, True]
                    self._index(fb.name, e)
                    self.cnt_src[src] = self.cnt_src.get(src, 0) + 1
                    self.cnt_dst[dst] = self.cnt_dst.get(dst, 0) + 1
            elif fb.action == "unset":
                for e in self._candidates(fb.name, fb.direction, src, dst):
                    if flexbit_entry_matches(fb.direction, e[0], e[1],
                                             e[2], e[3], src, dst,
                                             sport, dport):
                        e[5] = False              # mmap.c:784-990

    def _index(self, name: str, e: list) -> None:
        self.by_key[(name, e[0], e[1])] = e
        self.by_name.setdefault(name, []).append(e)
        self.idx_src.setdefault((name, e[0]), []).append(e)
        self.idx_dst.setdefault((name, e[1]), []).append(e)

    # -- streaming persistence ---------------------------------------------

    def dump(self) -> list:
        return [[name, e] for name, es in self.by_name.items() for e in es]

    @classmethod
    def load(cls, items: list) -> "FlexStore":
        st = cls()
        for name, e in items:
            st._index(name, e)
            st.cnt_src[e[0]] = st.cnt_src.get(e[0], 0) + 1
            st.cnt_dst[e[1]] = st.cnt_dst.get(e[1], 0) + 1
        return st


def flexbit_gate(rule, cond_ret: bool, count_ret: bool) -> bool:
    """The emission gate for flexbits, bug-compatible with
    engine.c:1470-1478: a count-only rule can never pass (none of the
    disjuncts holds), and set-only rules always pass."""
    has_set = any(fb.action in ("set", "unset") for fb in rule.flexbits)
    has_cond = any(fb.action in ("isset", "isnotset")
                   for fb in rule.flexbits)
    has_count = any(fb.action == "count" for fb in rule.flexbits)
    ok = (not rule.flexbits or
          (has_set and not has_cond) or
          (has_cond and cond_ret))
    if ok and has_count:
        ok = count_ret
    return ok


def xbit_track_value(track: str, ex: dict) -> str:
    """xbit store key value (Xbit_Return_Tracking_Hash analog,
    src/xbit.c:54-123): src, dst, or the pair."""
    if track == "ip_src":
        return ex["ip_src"]
    if track == "ip_dst":
        return ex["ip_dst"]
    return f"{ex['ip_src']}|{ex['ip_dst']}"
