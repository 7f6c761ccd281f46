"""Compiled-rule data model.

Mirrors the *semantics* of the reference's parallel rule arrays
(``struct RuleHead`` /root/reference/src/rules.h:68-79 and
``struct RuleBody`` /root/reference/src/rules.h:274-359) as frozen Python
dataclasses.  The compiler (compiler.py) produces these once on the driver;
they are then broadcast into the vectorized matcher and consumed by the
pure-Python oracle — both engines execute the *same* compiled program, but
with independent execution strategies (vectorized pandas vs row-at-a-time).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


# -- content ----------------------------------------------------------------

@dataclass(frozen=True)
class ContentSpec:
    """One ``content:"..."`` option with its modifiers.

    Window semantics follow the reference exactly
    (/root/reference/src/processors/engine.c:495-597):

    * ``offset``   — search region starts at byte ``offset`` of the message
                     (empty if offset >= len(msg)).
    * ``depth``    — region truncated to its first ``depth + 1`` bytes
                     (the reference's ``strlcpy(..., depth + 2)``).
    * ``distance`` — when non-zero the region is *recomputed from the
                     original message* starting at
                     ``prev_content.depth + distance + 1`` (anchored to the
                     previous content's *depth*, not its match position —
                     engine.c:545-548).
    * ``within``   — only applied when ``distance`` is non-zero; region
                     truncated to its first ``within`` bytes
                     (``strlcpy(..., within + 1)`` keeps ``within`` chars).
    """

    pattern: str
    nocase: bool = False
    negated: bool = False          # content:!"..."  (src/rules.c:637)
    offset: int = 0
    depth: int = 0
    distance: int = 0
    within: int = 0


@dataclass(frozen=True)
class PcreSpec:
    """``pcre:"/re/flags"`` translated to the Python ``re`` dialect.

    The reference runs PCRE against the *full* message with no windowing
    and no negation (engine.c:605-619).
    """

    pattern: str                   # python-re source, flags inlined
    flags: int = 0                 # re.I etc, already folded from /i /s /m

    def compiled(self) -> re.Pattern:
        return re.compile(self.pattern, self.flags)


@dataclass(frozen=True)
class MetaContentSpec:
    """``meta_content:"tpl",$VAR`` — template expanded at compile time into
    up to 256 alternatives (src/meta-content.c:49-111, limits
    src/sagan-defs.h:112-114).  OR-match over alternatives inside the same
    offset/depth/distance/within window logic as ContentSpec
    (engine.c:623-696)."""

    alternatives: tuple[str, ...]
    nocase: bool = False           # meta_nocase
    negated: bool = False
    offset: int = 0
    depth: int = 0
    distance: int = 0
    within: int = 0


# -- correlation ------------------------------------------------------------

TRACK_BY_SRC = "by_src"
TRACK_BY_DST = "by_dst"
TRACK_BY_USERNAME = "by_username"
TRACK_BY_SRCPORT = "by_srcport"
TRACK_BY_DSTPORT = "by_dstport"

_VALID_TRACKS = {TRACK_BY_SRC, TRACK_BY_DST, TRACK_BY_USERNAME,
                 TRACK_BY_SRCPORT, TRACK_BY_DSTPORT}


@dataclass(frozen=True)
class AfterSpec:
    """``after: track <t1&t2>, count C, seconds S``
    (src/after.c:51-229, struct src/rules.h:158-169).

    Suppress-until-seen: the keyed counter resets when ``now - utime > S``
    where ``utime`` is the *window anchor* (first event of the current
    window, bumped to ``now`` again on every event that exceeds the count —
    after.c:125-144).  Alert fires only once ``count > C``.
    """

    tracks: tuple[str, ...]        # subset of _VALID_TRACKS
    count: int
    seconds: int


@dataclass(frozen=True)
class ThresholdSpec:
    """``threshold: type limit|threshold, track ..., count C, seconds S``
    (src/threshold.c:54-231).

    Alert-until-exceeded: unlike After, ``utime`` is updated on *every*
    event (threshold.c:131-132) so the window expires only after an idle
    gap > S.  Suppression (flag=true) begins once ``count > C``.
    """

    ttype: str                     # "limit" | "threshold" (both same here)
    tracks: tuple[str, ...]
    count: int
    seconds: int


XBIT_SET = "set"
XBIT_UNSET = "unset"
XBIT_ISSET = "isset"
XBIT_ISNOTSET = "isnotset"


@dataclass(frozen=True)
class XbitSpec:
    """``xbits: set|unset|isset|isnotset, name, track ip_src|ip_dst|ip_pair
    [, expire E]`` (src/xbit.c:54-123, src/xbit-mmap.c:59-280).

    set   → store[(name, key)].expire_at = now + expire  (xbit-mmap.c:99)
    unset → store[(name, key)].expire_at = 0             (xbit-mmap.c:168)
    isset → live entry exists and now < expire_at        (xbit-mmap.c:208)
    isnotset → no live entry.
    Rule passes when all isset are set and all isnotset are unset
    (xbit-mmap.c:262-276).
    """

    action: str                    # set/unset/isset/isnotset
    name: str
    track: str = "ip_src"          # ip_src | ip_dst | ip_pair
    expire: int = 0


FLEXBIT_DIRECTIONS = (
    # the 12 direction modes + none (Flexbit_Type, src/flexbit.c:63-135)
    "none", "both", "by_src", "by_dst", "reverse",
    "src_xbitdst", "dst_xbitsrc",
    "both_p", "by_src_p", "by_dst_p", "reverse_p",
    "src_xbitdst_p", "dst_xbitsrc_p",
)


@dataclass(frozen=True)
class FlexbitSpec:
    """``flexbits:`` — like xbits, but the store entry records the full
    (ip_src, ip_dst, src_port, dst_port) tuple of the setting event and
    conditions compare direction-specifically
    (src/flexbit-mmap.c:61-1494; direction table src/flexbit.c:63-135).

    Syntax accepted (doc/source/rule-keywords.rst:299-336):
      flexbits: set, <name>, <timeout_seconds>
      flexbits: {unset|isset|isnotset}, <direction>, <name>
      flexbits: count, {by_src|by_dst}, {gt|lt|eq} <N>
    Count semantics (Flexbit_Count_MMAP, flexbit-mmap.c:671-744): counts
    store entries whose direction-IP matches the event — name-agnostic
    and state-agnostic (reference quirk preserved); ``gt`` fires when
    counter > N.  The fork wires only ``gt``; ``lt``/``eq`` follow
    rules.h:110-112 against the final counter.
    """

    action: str                    # set/unset/isset/isnotset/count
    name: str = ""                 # empty for count (name-agnostic)
    direction: str = "none"
    timeout: int = 0               # set only (flexbit_timeout)
    count_op: str = "gt"           # count only (flexbit_count_gt_lt)
    count_n: int = 0               # count only (flexbit_count_counter)


def flexbit_entry_matches(direction: str, e_src: str, e_dst: str,
                          e_sport: int, e_dport: int, c_src: str,
                          c_dst: str, c_sport: int, c_dport: int) -> bool:
    """Direction-specific store-entry vs current-event compare — the
    memcmp ladder of Flexbit_Condition_MMAP (flexbit-mmap.c:104-320),
    shared by isset/isnotset/unset."""
    if direction == "none":
        return True
    if direction == "both":
        return e_src == c_src and e_dst == c_dst
    if direction == "by_src":
        return e_src == c_src
    if direction == "by_dst":
        return e_dst == c_dst
    if direction == "reverse":
        return e_src == c_dst and e_dst == c_src
    if direction == "src_xbitdst":
        return e_dst == c_src
    if direction == "dst_xbitsrc":
        return e_src == c_dst
    if direction == "both_p":
        return (e_src == c_src and e_dst == c_dst and
                e_sport == c_sport and e_dport == c_dport)
    if direction == "by_src_p":
        return e_src == c_src and e_sport == c_sport
    if direction == "by_dst_p":
        return e_dst == c_dst and e_dport == c_dport
    if direction == "reverse_p":
        return (e_src == c_dst and e_dst == c_src and
                e_sport == c_dport and e_dport == c_sport)
    if direction == "src_xbitdst_p":
        return e_dst == c_src and e_dport == c_sport
    if direction == "dst_xbitsrc_p":
        return e_src == c_dst and e_sport == c_dport
    raise ValueError(f"unknown flexbit direction {direction!r}")


@dataclass(frozen=True)
class AlertTimeSpec:
    """``alert_time: days 0123456, time 0800-1700``
    (src/aetas.c:48-211; day bits src/sagan-defs.h:164-170).
    days: set of 0..6 (0=Sunday, tm_wday convention); start/end are HHMM
    ints; midnight wrap supported (start > end → next_day,
    aetas.c:93-139)."""

    days: frozenset[int]
    start: int
    end: int


# -- header -----------------------------------------------------------------

@dataclass(frozen=True)
class TargetSpec:
    """One side of the rule header (src/rules.c:315-439).

    ``ranges`` are inclusive integer ranges (IPs as ints via IP2Bit-analog,
    ports as plain ints); ``negated`` flips membership; ``any`` short-
    circuits to True."""

    any: bool = True
    negated: bool = False
    ranges: tuple[tuple[int, int], ...] = ()

    def contains(self, value: int | None) -> bool:
        if self.any:
            return True
        if value is None:
            return False
        hit = any(lo <= value <= hi for lo, hi in self.ranges)
        return (not hit) if self.negated else hit


@dataclass(frozen=True)
class RuleHead:
    """action proto src sport direction dst dport
    (ParseRuleHead, src/rules.c:223-313)."""

    action: str = "alert"          # alert | drop
    proto: str = "any"             # syslog/any/tcp/udp/icmp
    src_ip: TargetSpec = field(default_factory=TargetSpec)
    src_port: TargetSpec = field(default_factory=TargetSpec)
    direction: str = "->"          # -> | <- | <> | any
    dst_ip: TargetSpec = field(default_factory=TargetSpec)
    dst_port: TargetSpec = field(default_factory=TargetSpec)
    all_any: bool = True           # AllAny fast-track (src/rules.c:303-310)


# -- the rule ---------------------------------------------------------------

@dataclass(frozen=True)
class CompiledRule:
    head: RuleHead
    sid: int
    rev: int = 1
    msg: str = ""
    classtype: str = ""
    priority: int = 0              # explicit or classification-derived
    gid: int = 5000001             # SAGAN_PROCESSOR_GENERATOR_ID analog
    references: tuple[tuple[str, str], ...] = ()

    # gates (engine.c:401-485); evaluated in this exact order, and —
    # bug-compatibly with the reference — each present gate RESETS the
    # fail flag, so the LAST present gate decides (the `match = true`
    # re-initialisation per block).
    program: tuple[str, ...] = ()      # glob alternatives (Wildcard, util.c:1069)
    facility: tuple[str, ...] = ()
    level: tuple[str, ...] = ()
    tag: tuple[str, ...] = ()
    syspri: tuple[str, ...] = ()

    contents: tuple[ContentSpec, ...] = ()
    pcres: tuple[PcreSpec, ...] = ()
    meta_contents: tuple[MetaContentSpec, ...] = ()

    # extraction (engine.c:842-962)
    parse_src_ip: int = 0          # Nth IP from the lookup cache (1-based)
    parse_dst_ip: int = 0
    parse_port: bool = False
    parse_proto: bool = False
    parse_proto_program: bool = False
    parse_hash: str = ""           # md5 | sha1 | sha256
    normalize: bool = False        # grok-style named-group extraction

    # correlation
    after: AfterSpec | None = None
    threshold: ThresholdSpec | None = None
    xbits: tuple[XbitSpec, ...] = ()
    flexbits: tuple[FlexbitSpec, ...] = ()
    alert_time: AlertTimeSpec | None = None

    # enrichment gates
    blacklist: bool = False        # blacklist lookup gate (engine.c:1246-1273)
    intel: tuple[str, ...] = ()    # zeek-intel lookups (engine.c:1396-1459)
    geoip_track: str = ""          # country_code track (by_src|by_dst)
    geoip_is: bool = True          # is vs isnot (geoip2_type, engine.c:1188)
    geoip_codes: tuple[str, ...] = ()   # ISO3166 codes

    # dynamic rule loading (src/processors/dynamic-rules.c:58-182):
    # evaluated only on sampled lines; on first match the named ruleset
    # is loaded and ONE alert fires (already-loaded → silent)
    dynamic_load: str = ""

    # sink flags
    noalert: bool = False          # flexbit/xbit noalert analog
    noeve: bool = False
    email: str = ""                # K7 routed-sink flag only
    external: str = ""             # K8 routed-sink flag only

    @property
    def key(self) -> tuple[int, int]:
        return (self.sid, self.rev)


def glob_to_regex(glob: str) -> str:
    """Shell-style ``*``/``?`` glob → anchored regex
    (Wildcard semantics, /root/reference/src/util.c:1069-1092)."""
    out = []
    for ch in glob:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def content_window(msg: str, spec, prev_depth: int) -> str:
    """Compute the search region for one content/meta_content, exactly as
    the reference does (engine.c:502-558 / 636-696).  ``prev_depth`` is the
    previous content's ``depth`` value (0 for the first content)."""
    if spec.offset != 0:
        s = msg[spec.offset:] if len(msg) > spec.offset else ""
    else:
        s = msg
    if spec.depth != 0:
        # strlcpy(alter, alter, depth + 2) keeps depth+1 chars (engine.c:537)
        s = s[: spec.depth + 1]
    if spec.distance != 0:
        start = prev_depth + spec.distance + 1          # engine.c:545-548
        s = msg[start:] if start < len(msg) else ""
        if spec.within != 0:
            s = s[: spec.within]                        # engine.c:553-556
    return s
