"""Pure-Python row-at-a-time reference engine ("the oracle").

Implements §2 of SURVEY.md directly from the reference citations —
obviously-correct, small-scale-only.  The Spark engine must produce
identical routed rows and per-sink counts on the same (transcripts, rules)
input; tests/ assert that equality ordered by (conv_id, turn_idx, sid).

Semantics sources (all /root/reference/):
* rule loop & match cascade — src/processors/engine.c:96-1683
* gate quirk: each present gate re-initialises the fail flag, so the LAST
  present gate decides (engine.c:401-485) — preserved bug-compatibly
* content windows — engine.c:495-597 (see model.content_window)
* after — src/after.c:51-229 ; threshold — src/threshold.c:54-231
* xbits — src/xbit-mmap.c:59-280
* alert_time — src/aetas.c:48-211
* ignore list — src/sagan.c:1230-1248
* counters — src/sagan.h:194-345, src/stats.c:109-114

Batch reinterpretation (documented deviation): the reference orders state
updates by wall-clock arrival (src/after.c:63); we order deterministically
by (ts, conv_id, turn_idx) and use the event's own epoch seconds as "now".
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime, timezone

from sagan_spark.extract import (
    DEFAULT_PORT,
    DEFAULT_PROTO,
    blacklist_hit,
    geoip_pass,
    intel_hit,
)
from sagan_spark.rules.compiler import RuleSet
from sagan_spark.semantics import (
    FlexStore,
    PrimCache,
    alert_time_pass,
    extract_for_rule,
    flexbit_gate,
    flow_pass,
    track_key,
    xbit_track_value,
)
from sagan_spark.rules.model import (
    CompiledRule,
    XBIT_ISNOTSET,
    XBIT_ISSET,
    XBIT_SET,
    XBIT_UNSET,
    content_window,
    glob_to_regex,
)

GID = 5000001  # SAGAN_PROCESSOR_GENERATOR_ID analog


@dataclass(frozen=True)
class Event:
    """One transcript turn (BASELINE.json input_hint shape).  Field
    correspondence per SURVEY §1.4: text→syslog_message, tool→program,
    role→facility/level/tag, conv_id→syslog_host, ts→date+time."""

    conv_id: str
    turn_idx: int
    role: str
    text: str
    tool: str
    ts: datetime   # tz-aware UTC

    @property
    def epoch(self) -> int:
        return int(self.ts.timestamp())


@dataclass
class _AfterState:
    count: int = 0
    utime: int = 0


@dataclass
class _XbitState:
    expire_at: int = 0   # 0 == unset (xbit-mmap.c:168)


def _sort_key(ev: Event):
    return (ev.epoch, ev.conv_id, ev.turn_idx)


def _gate_pass(alts: tuple[str, ...], value: str, glob: bool) -> bool:
    if glob:
        return any(re.match(glob_to_regex(a), value or "") for a in alts)
    return any(a == value for a in alts)


class OracleEngine:
    def __init__(self, ruleset: RuleSet, default_port: int = DEFAULT_PORT,
                 default_proto: str = DEFAULT_PROTO):
        self.rs = ruleset
        self.default_port = default_port
        self.default_proto = default_proto
        self._compiled_pcre = {
            r.sid: [p.compiled() for p in r.pcres] for r in ruleset.rules}
        self.reset()

    def reset(self) -> None:
        self.after_state: dict[tuple, _AfterState] = {}
        self.thresh_state: dict[tuple, _AfterState] = {}
        self.xbit_state: dict[tuple, _XbitState] = {}
        self.flex_store = FlexStore()
        self.alerts: list[dict] = []
        self.eve_alerts: list[dict] = []
        self.eve_logs: list[dict] = []
        self.drops: list[dict] = []
        self.counters: dict[str, int] = {
            "events_received": 0, "events_processed": 0, "ignore_count": 0,
            "saganfound": 0, "alert_total": 0, "after_total": 0,
            "threshold_total": 0, "eve_alert_total": 0, "eve_log_total": 0,
        }

    # -- match cascade -----------------------------------------------------

    def _gates_pass(self, rule: CompiledRule, ev: Event) -> bool:
        """program/facility/level/tag/syspri gates.  Bug-compatible with
        engine.c:401-485: each present gate overwrites the fail flag, so
        only the LAST present gate decides."""
        failed = False
        present = False
        if rule.program:
            present, failed = True, not _gate_pass(rule.program, ev.tool, True)
        if rule.facility:
            present, failed = True, not _gate_pass(rule.facility, ev.role, False)
        if rule.level:
            present, failed = True, not _gate_pass(rule.level, ev.role, False)
        if rule.tag:
            present, failed = True, not _gate_pass(rule.tag, ev.role, False)
        if rule.syspri:
            present, failed = True, not _gate_pass(rule.syspri, ev.role, False)
        return not (present and failed)

    def _body_match(self, rule: CompiledRule, ev: Event) -> bool:
        """content → pcre → meta_content conjunction; match requires
        sagan_match == content + pcre + meta counts (engine.c:703)."""
        msg = ev.text
        # contents (engine.c:495-597)
        for z, c in enumerate(rule.contents):
            prev_depth = rule.contents[z - 1].depth if z > 0 else 0
            region = content_window(msg, c, prev_depth)
            if c.nocase:
                hit = c.pattern.lower() in region.lower()
            else:
                hit = c.pattern in region
            if hit == c.negated:
                return False
        # pcre — full message, only if all contents matched (engine.c:605)
        for rx in self._compiled_pcre[rule.sid]:
            if not rx.search(msg):
                return False
        # meta_content (engine.c:623-696)
        for z, mspec in enumerate(rule.meta_contents):
            prev_depth = (rule.meta_contents[z - 1].depth if z > 0 else 0)
            region = content_window(msg, mspec, prev_depth)
            hay = region.lower() if mspec.nocase else region
            alts = ([a.lower() for a in mspec.alternatives] if mspec.nocase
                    else list(mspec.alternatives))
            hit = any(a in hay for a in alts)
            if hit == mspec.negated:
                return False
        return True

    # -- extraction: shared semantics.extract_for_rule (engine.c:709-1045)

    def _extract(self, rule: CompiledRule, ev: Event, pc: PrimCache) -> dict:
        return extract_for_rule(rule, ev.conv_id, pc,
                                self.default_port, self.default_proto)

    # -- header flow check: shared semantics.flow_pass (src/flow.c:49-427)

    def _flow_pass(self, rule: CompiledRule, ex: dict) -> bool:
        return flow_pass(rule, ex)

    # -- correlation ---------------------------------------------------------

    @staticmethod
    def _track_key(tracks: tuple[str, ...], ex: dict) -> str:
        return track_key(tracks, ex)

    def _after_check(self, rule: CompiledRule, ex: dict, now: int) -> bool:
        """Returns after_log_flag: True = suppress (after.c:51-229)."""
        spec = rule.after
        key = (rule.sid, rule.rev, self._track_key(spec.tracks, ex))
        st = self.after_state.get(key)
        if st is None:
            self.after_state[key] = _AfterState(count=1, utime=now)
            return True
        st.count += 1
        flag = True
        if now - st.utime > spec.seconds:      # reset (after.c:130-137)
            st.count = 1
            st.utime = now
            flag = True
        if spec.count < st.count:              # fire (after.c:140-147)
            st.utime = now
            flag = False
            self.counters["after_total"] += 1
        return flag

    def _threshold_check(self, rule: CompiledRule, ex: dict,
                         now: int) -> bool:
        """Returns thresh_log_flag: True = suppress (threshold.c:54-231)."""
        spec = rule.threshold
        key = (rule.sid, self._track_key(spec.tracks, ex))
        st = self.thresh_state.get(key)
        if st is None:
            self.thresh_state[key] = _AfterState(count=1, utime=now)
            return False
        st.count += 1
        oldtime = now - st.utime
        st.utime = now                          # rolling (threshold.c:131)
        flag = False
        if oldtime > spec.seconds:
            st.count = 1
            flag = False
        if spec.count < st.count:
            flag = True
            self.counters["threshold_total"] += 1
        return flag

    def _xbit_key(self, xb, ex: dict) -> tuple:
        return (xb.name, xbit_track_value(xb.track, ex))

    def _xbit_condition(self, rule: CompiledRule, ex: dict,
                        now: int) -> bool:
        """isset/isnotset gate (Xbit_Condition_MMAP, xbit-mmap.c:180-280)."""
        n_isset = sum(1 for x in rule.xbits if x.action == XBIT_ISSET)
        n_isnotset = sum(1 for x in rule.xbits if x.action == XBIT_ISNOTSET)
        if n_isset == 0 and n_isnotset == 0:
            return True
        ok_isset = ok_isnotset = 0
        for xb in rule.xbits:
            st = self.xbit_state.get(self._xbit_key(xb, ex))
            live = st is not None and st.expire_at != 0 and now < st.expire_at
            if xb.action == XBIT_ISSET and live:
                ok_isset += 1
            elif xb.action == XBIT_ISNOTSET and not live:
                ok_isnotset += 1
        return ok_isset == n_isset and ok_isnotset == n_isnotset

    def _xbit_set(self, rule: CompiledRule, ex: dict, now: int) -> None:
        """set/unset post-match (Xbit_Set_MMAP, xbit-mmap.c:59-175)."""
        for xb in rule.xbits:
            key = self._xbit_key(xb, ex)
            if xb.action == XBIT_SET:
                self.xbit_state[key] = _XbitState(expire_at=now + xb.expire)
            elif xb.action == XBIT_UNSET:
                if key in self.xbit_state:
                    self.xbit_state[key].expire_at = 0

    # -- alert_time: shared semantics.alert_time_pass (aetas.c:48-211)

    @staticmethod
    def _alert_time_pass(spec, ts: datetime) -> bool:
        return alert_time_pass(spec, ts)

    # -- the event loop --------------------------------------------------------

    def run(self, events: list[Event]) -> dict:
        """Process events in deterministic (ts, conv_id, turn_idx) order;
        returns {"alerts", "eve_alerts", "eve_logs", "drops", "counters"}."""
        for ev in sorted(events, key=_sort_key):
            self._process(ev)
        self.alerts.sort(key=lambda a: (a["conv_id"], a["turn_idx"], a["sid"]))
        self.eve_alerts.sort(
            key=lambda a: (a["conv_id"], a["turn_idx"], a["sid"]))
        self.eve_logs.sort(key=lambda a: (a["conv_id"], a["turn_idx"]))
        self.drops.sort(key=lambda a: (a["conv_id"], a["turn_idx"]))
        return {"alerts": self.alerts, "eve_alerts": self.eve_alerts,
                "eve_logs": self.eve_logs, "drops": self.drops,
                "counters": dict(self.counters)}

    def _process(self, ev: Event) -> None:
        c = self.counters
        c["events_received"] += 1
        # ignore-list short-circuit (sagan.c:1230-1248)
        if any(s in ev.text for s in self.rs.ignore_list):
            c["ignore_count"] += 1
            self.drops.append({"conv_id": ev.conv_id, "turn_idx": ev.turn_idx,
                               "ts": ev.ts, "text": ev.text})
            return
        c["events_processed"] += 1
        now = ev.epoch
        pc = None  # per-event parse-once cache (engine.c:845-860)

        for rule in self.rs.rules:      # load order (engine.c:300)
            if not self._gates_pass(rule, ev):
                continue
            if not self._body_match(rule, ev):
                continue
            if pc is None:
                pc = PrimCache(ev.text, ev.tool,
                               self.rs.normalize_rulebase)
            ex = self._extract(rule, ev, pc)
            if not self._flow_pass(rule, ex):
                continue
            # flexbit condition + count gate (engine.c:1141-1151, 1470-1478)
            if rule.flexbits:
                cond_ret = self.flex_store.condition(
                    rule, ex["ip_src"], ex["ip_dst"], ex["src_port"],
                    ex["dst_port"], now)
                count_ret = self.flex_store.count_check(
                    rule, ex["ip_src"], ex["ip_dst"])
                if not flexbit_gate(rule, cond_ret, count_ret):
                    continue
            if not self._xbit_condition(rule, ex, now):
                continue
            if rule.alert_time and not self._alert_time_pass(
                    rule.alert_time, ev.ts):
                continue
            # country_code gate (engine.c:1161-1225)
            if rule.geoip_track and not geoip_pass(
                    rule, ex["ip_src"], ex["ip_dst"], self.rs.geoip_ranges):
                continue
            if rule.blacklist and not (
                    blacklist_hit(ex["ip_src"], self.rs.blacklist_ranges) or
                    blacklist_hit(ex["ip_dst"], self.rs.blacklist_ranges)):
                continue
            # zeek-intel gate (engine.c:1396-1459)
            if rule.intel and not intel_hit(
                    rule.intel, ex["ip_src"], ex["ip_dst"], ev.text,
                    self.rs.intel_sets):
                continue
            # after → threshold (engine.c:1516-1532)
            after_flag = False
            if rule.after is not None:
                after_flag = self._after_check(rule, ex, now)
            thresh_flag = False
            if rule.threshold is not None and not after_flag:
                thresh_flag = self._threshold_check(rule, ex, now)
            c["saganfound"] += 1        # engine.c:1543, pre-suppression
            if after_flag or thresh_flag:
                continue
            self._xbit_set(rule, ex, now)   # engine.c:1560-1565
            if rule.flexbits:               # engine.c:1566-1570
                self.flex_store.apply_sets(
                    rule, ex["ip_src"], ex["ip_dst"], ex["src_port"],
                    ex["dst_port"], now)
            self._emit(rule, ev, ex)

    def _emit(self, rule: CompiledRule, ev: Event, ex: dict) -> None:
        cls = self.rs.classifications.get(rule.classtype, ("", rule.priority))
        base = {
            "conv_id": ev.conv_id, "turn_idx": ev.turn_idx, "ts": ev.ts,
            "gid": GID, "sid": rule.sid, "rev": rule.rev, "msg": rule.msg,
            "classtype": rule.classtype, "class_desc": cls[0],
            "pri": rule.priority or cls[1],
            "ip_src": ex["ip_src"], "src_port": ex["src_port"],
            "ip_dst": ex["ip_dst"], "dst_port": ex["dst_port"],
            "proto": ex["proto"], "text": ev.text,
            "action": rule.head.action,
        }
        if not rule.noalert:
            self.alerts.append(dict(base))
            self.counters["alert_total"] += 1
        if not rule.noeve:
            self.eve_alerts.append(dict(base))
            self.counters["eve_alert_total"] += 1

    # eve "log" records for every processed line (json-handler.c:258-322)
    def emit_eve_logs(self, events: list[Event]) -> None:
        for ev in sorted(events, key=_sort_key):
            if any(s in ev.text for s in self.rs.ignore_list):
                continue
            self.eve_logs.append({
                "conv_id": ev.conv_id, "turn_idx": ev.turn_idx, "ts": ev.ts,
                "event_type": "log", "text": ev.text})
            self.counters["eve_log_total"] += 1
