"""Stage 2 — MATCH: the vectorized rule-match engine.

One ``mapInPandas`` pass evaluates the whole compiled rule set against each
Arrow batch and explodes (event × matched-rule) rows — the Spark-first
re-expression of the reference's per-event rule loop
(``Sagan_Engine``, /root/reference/src/processors/engine.c:96-1683).

Execution strategy (scale notes):

* **Narrow stage** — no shuffle: matching is embarrassingly parallel over
  input partitions; at 10^12 turns this stage scales linearly with
  executors.
* **Vectorized hot path** — gates and content/pcre/meta predicates are
  pandas/NumPy C loops over Arrow columns (the SIMD-strstr analog,
  src/parsers/strstr-asm/*).  Never per-row Python.
* **Progressive masking** — predicates run cheap-to-expensive
  (program/role gates → content → pcre → meta_content), each evaluated
  only on rows still alive — the reference's predicate-ordering
  optimization (doc/source/high-performance.rst:78-93) with the added win
  that a dead row skips *all* remaining predicates.
* **Lazy extraction** — parse_src_ip/hash/normalize run only on matched
  rows, memoized per event across rules (the parse-once cache,
  engine.c:845-860).
* Content windows (offset/depth/distance/within) have *constant* bounds
  per rule (model.content_window), so they vectorize as ``str.slice``.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd

from .extract import DEFAULT_PORT, DEFAULT_PROTO
from .rules.compiler import RuleSet
from .rules.model import glob_to_regex
from .semantics import (
    PrimCache,
    alert_time_pass,
    extract_for_rule,
    flow_pass,
    track_key,
    xbit_track_value,
)
from .extract import blacklist_hit

MATCH_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, epoch long, rule_idx int, sid long, rev int, "
    "action string, msg string, classtype string, pri int, "
    "ip_src string, src_port int, ip_dst string, dst_port int, "
    "proto string, username string, hash string, "
    "after_key string, thresh_key string, xbit_key string"
)

_OUT_COLS = [c.split()[0] for c in MATCH_SCHEMA.split(", ")]
_DTYPES = {"turn_idx": "int32", "epoch": "int64", "rule_idx": "int32",
           "sid": "int64", "rev": "int32", "pri": "int32",
           "src_port": "int32", "dst_port": "int32"}


def _window_bounds(spec, prev_depth: int) -> tuple[int, int | None]:
    """Constant slice bounds for one content/meta window — the vectorized
    form of model.content_window (engine.c:502-558)."""
    if spec.distance != 0:
        start = prev_depth + spec.distance + 1
        stop = start + spec.within if spec.within else None
        return start, stop
    start = spec.offset
    stop = start + spec.depth + 1 if spec.depth else None
    return start, stop


class _RuleProgram:
    """Executor-side compiled form of one rule: everything regex is
    pre-compiled once per executor (the PCRE-JIT analog,
    src/sagan.c:686-700)."""

    def __init__(self, idx: int, rule):
        self.idx = idx
        self.rule = rule
        # last-present-gate-wins quirk (engine.c:401-485)
        self.gate = None
        if rule.program:
            alt = "|".join(glob_to_regex(g)[1:-1] for g in rule.program)
            self.gate = ("tool_re", re.compile(f"(?:{alt})"))
        for attr in ("facility", "level", "tag", "syspri"):
            vals = getattr(rule, attr)
            if vals:
                self.gate = ("role_in", frozenset(vals))
        self.contents = []
        for z, c in enumerate(rule.contents):
            prev_depth = rule.contents[z - 1].depth if z > 0 else 0
            self.contents.append((_window_bounds(c, prev_depth), c))
        self.pcres = [(re.compile(p.pattern, p.flags)) for p in rule.pcres]
        self.metas = []
        for z, m in enumerate(rule.meta_contents):
            prev_depth = rule.meta_contents[z - 1].depth if z > 0 else 0
            flags = re.I if m.nocase else 0
            alt = re.compile("|".join(re.escape(a) for a in m.alternatives),
                             flags)
            self.metas.append((_window_bounds(m, prev_depth), alt, m.negated))
        self.needs_extract = bool(
            rule.parse_src_ip or rule.parse_dst_ip or rule.parse_port or
            rule.parse_hash or rule.parse_proto or rule.parse_proto_program
            or rule.normalize or not rule.head.all_any or rule.blacklist
            or rule.after or rule.threshold or rule.xbits)

    # -- vectorized predicates ------------------------------------------------

    def alive_after_gates(self, alive: np.ndarray, tool: pd.Series,
                          role: pd.Series) -> np.ndarray:
        if self.gate is None:
            return alive
        kind, arg = self.gate
        if kind == "tool_re":
            ok = tool.iloc[alive].str.fullmatch(arg).to_numpy(dtype=bool,
                                                              na_value=False)
        else:
            ok = role.iloc[alive].isin(arg).to_numpy()
        return alive[ok]

    def alive_after_body(self, alive: np.ndarray,
                         text: pd.Series) -> np.ndarray:
        for (start, stop), c in self.contents:
            if alive.size == 0:
                return alive
            region = text.iloc[alive].str.slice(start, stop)
            if c.nocase:
                hit = region.str.lower().str.contains(
                    c.pattern.lower(), regex=False)
            else:
                hit = region.str.contains(c.pattern, regex=False)
            hit = hit.to_numpy(dtype=bool, na_value=False)
            alive = alive[~hit] if c.negated else alive[hit]
        for rx in self.pcres:
            if alive.size == 0:
                return alive
            hit = text.iloc[alive].str.contains(rx).to_numpy(
                dtype=bool, na_value=False)
            alive = alive[hit]
        for (start, stop), alt_rx, negated in self.metas:
            if alive.size == 0:
                return alive
            region = text.iloc[alive].str.slice(start, stop)
            hit = region.str.contains(alt_rx).to_numpy(
                dtype=bool, na_value=False)
            alive = alive[~hit] if negated else alive[hit]
        return alive


def compile_programs(ruleset: RuleSet) -> list[_RuleProgram]:
    return [_RuleProgram(i, r) for i, r in enumerate(ruleset.rules)]


def match_batch(pdf: pd.DataFrame, ruleset: RuleSet,
                programs: list[_RuleProgram],
                default_port: int = DEFAULT_PORT,
                default_proto: str = DEFAULT_PROTO) -> pd.DataFrame:
    n = len(pdf)
    text = pdf["text"].astype("string").fillna("").astype(str)
    tool = pdf["tool"].astype("string").fillna("").astype(str)
    role = pdf["role"].astype("string").fillna("").astype(str)
    all_rows = np.arange(n)
    prim: dict[int, PrimCache] = {}   # per-event parse-once cache
    cols: dict[str, list] = {c: [] for c in _OUT_COLS}

    conv_np = pdf["conv_id"].to_numpy()
    turn_np = pdf["turn_idx"].to_numpy()
    ts_np = pdf["ts"].to_numpy()
    epoch_np = pdf["epoch"].to_numpy()
    role_np = role.to_numpy()
    tool_np = tool.to_numpy()
    text_np = text.to_numpy()

    for prog in programs:
        alive = prog.alive_after_gates(all_rows, tool, role)
        alive = prog.alive_after_body(alive, text)
        if alive.size == 0:
            continue
        rule = prog.rule
        cls = ruleset.classifications.get(rule.classtype,
                                          ("", rule.priority))
        pri = rule.priority or cls[1]
        for i in alive.tolist():
            if prog.needs_extract:
                pc = prim.get(i)
                if pc is None:
                    pc = prim[i] = PrimCache(text_np[i], tool_np[i])
                ex = extract_for_rule(rule, conv_np[i], pc,
                                      default_port, default_proto)
                if not flow_pass(rule, ex):
                    continue
            else:
                ex = {"ip_src": conv_np[i], "src_port": default_port,
                      "ip_dst": conv_np[i], "dst_port": default_port,
                      "proto": default_proto, "username": "", "hash": ""}
            if rule.alert_time is not None and not alert_time_pass(
                    rule.alert_time, pdf["ts"].iloc[i]):
                continue
            if rule.blacklist and not (
                    blacklist_hit(ex["ip_src"], ruleset.blacklist_ranges) or
                    blacklist_hit(ex["ip_dst"], ruleset.blacklist_ranges)):
                continue
            cols["conv_id"].append(conv_np[i])
            cols["turn_idx"].append(turn_np[i])
            cols["role"].append(role_np[i])
            cols["text"].append(text_np[i])
            cols["tool"].append(tool_np[i])
            cols["ts"].append(ts_np[i])
            cols["epoch"].append(int(epoch_np[i]))
            cols["rule_idx"].append(prog.idx)
            cols["sid"].append(rule.sid)
            cols["rev"].append(rule.rev)
            cols["action"].append(rule.head.action)
            cols["msg"].append(rule.msg)
            cols["classtype"].append(rule.classtype)
            cols["pri"].append(pri)
            cols["ip_src"].append(ex["ip_src"])
            cols["src_port"].append(ex["src_port"])
            cols["ip_dst"].append(ex["ip_dst"])
            cols["dst_port"].append(ex["dst_port"])
            cols["proto"].append(ex["proto"])
            cols["username"].append(ex["username"])
            cols["hash"].append(ex["hash"])
            cols["after_key"].append(
                track_key(rule.after.tracks, ex) if rule.after else None)
            cols["thresh_key"].append(
                track_key(rule.threshold.tracks, ex)
                if rule.threshold else None)
            cols["xbit_key"].append(
                xbit_track_value(rule.xbits[0].track, ex)
                if rule.xbits else None)
    out = pd.DataFrame(cols)
    for c, dt in _DTYPES.items():
        out[c] = out[c].astype(dt) if len(out) else \
            pd.Series([], dtype=dt)
    return out


def build_matcher(ruleset: RuleSet, default_port: int = DEFAULT_PORT,
                  default_proto: str = DEFAULT_PROTO):
    """Returns a mapInPandas function.  The RuleSet travels in the task
    closure (compiled regexes are rebuilt per executor, not pickled)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        programs = compile_programs(ruleset)
        for pdf in batches:
            yield match_batch(pdf, ruleset, programs,
                              default_port, default_proto)

    return fn


def run_match(parsed_df, ruleset: RuleSet,
              default_port: int = DEFAULT_PORT,
              default_proto: str = DEFAULT_PROTO):
    """parsed transcripts → exploded (event × matched rule) DataFrame."""
    needed = parsed_df.select("conv_id", "turn_idx", "role", "text",
                              "tool", "ts", "epoch")
    return needed.mapInPandas(
        build_matcher(ruleset, default_port, default_proto),
        schema=MATCH_SCHEMA)
