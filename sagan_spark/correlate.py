"""Stage 5 — CORRELATE: after / threshold / xbit stateful semantics.

The reference keeps this state in mmap'd shared memory keyed by
Djb2(track-string) (/root/reference/src/after.c, src/threshold.c,
src/xbit-mmap.c).  Here each state key becomes a Spark group:

* ``after``      — groupBy (sid, rev, after_key)   [after.c:113-117 matches
                   hash + sid + rev]
* ``threshold``  — groupBy (sid, thresh_key)       [threshold.c:118-121
                   matches hash + sid only — rev is NOT part of the key]
* ``xbits``      — groupBy (xbit_key = track value); the store key is
                   (name, value) (xbit-mmap.c:88-91), and value equality
                   implies group colocation, so one group sees every
                   interacting set/unset/isset row.

Each group is processed by ``applyInPandas`` in deterministic
(epoch, conv_id, turn_idx, rule_idx) order — the batch replacement for the
reference's wall-clock arrival order (SURVEY §2.6).  State per group is
O(1); group sizes are bounded by per-key match counts, so this shuffles
only the *matched* rows (a small fraction of input) and scales by key
count.  Hot keys are bounded by conversation length; AQE handles the
shuffle-partition balance.

Scale note: this is the only shuffling stage of the whole pipeline
(3 narrow shuffles over matched rows).  Window-function SQL could express
the sliding-count part, but NOT the reference's data-dependent reset
anchoring (after.c:130-137 resets from the *window anchor*, threshold.c:131
rolls the anchor on every event) — hence grouped state, exactly as
SURVEY §4.3 planned.

Restriction (documented): a rule combining xbits with after/threshold
would create a cross-key state dependency cycle (xbit condition gates the
after counter, after suppression gates the xbit set, engine.c:1132/1560).
The pipeline rejects such rules at plan time; the oracle supports them.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from .match import MATCH_SCHEMA
from .rules.compiler import RuleSet

CORR_SCHEMA = (MATCH_SCHEMA +
               ", suppress_after boolean, suppress_thresh boolean, "
               "xbit_pass boolean")

_SORT = ["epoch", "conv_id", "turn_idx", "rule_idx"]


def validate_ruleset_for_spark(ruleset: RuleSet) -> None:
    for r in ruleset.rules:
        if r.xbits and (r.after or r.threshold):
            raise ValueError(
                f"sid {r.sid}: xbits combined with after/threshold creates "
                "a cross-key state cycle; unsupported in distributed mode")
        if r.xbits and len({x.track for x in r.xbits}) > 1:
            raise ValueError(
                f"sid {r.sid}: all xbits in a rule must share one track "
                "(single group key) in distributed mode")


def _after_group(ruleset: RuleSet):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(_SORT).reset_index(drop=True)
        count, utime, first = 0, 0, True
        flags = []
        rule_cache = {}
        for t, ridx in zip(pdf["epoch"].tolist(),
                           pdf["rule_idx"].tolist()):
            spec = rule_cache.get(ridx)
            if spec is None:
                spec = rule_cache[ridx] = ruleset.rules[ridx].after
            if first:                      # add-new-entry path (after.c:155+)
                count, utime, first = 1, t, False
                flags.append(True)
                continue
            count += 1
            flag = True
            if t - utime > spec.seconds:   # window-anchor reset (after.c:130)
                count, utime, flag = 1, t, True
            if spec.count < count:         # fire (after.c:140-147)
                utime, flag = t, False
            flags.append(flag)
        pdf["suppress_after"] = pd.Series(flags, dtype=bool)
        return pdf

    return fn


def _threshold_group(ruleset: RuleSet):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(_SORT).reset_index(drop=True)
        count, utime, first = 0, 0, True
        flags = []
        rule_cache = {}
        for t, ridx in zip(pdf["epoch"].tolist(),
                           pdf["rule_idx"].tolist()):
            spec = rule_cache.get(ridx)
            if spec is None:
                spec = rule_cache[ridx] = ruleset.rules[ridx].threshold
            if first:
                count, utime, first = 1, t, False
                flags.append(False)
                continue
            count += 1
            oldtime = t - utime
            utime = t                      # rolling anchor (threshold.c:131)
            flag = False
            if oldtime > spec.seconds:
                count, flag = 1, False
            if spec.count < count:         # suppress (threshold.c:138-147)
                flag = True
            flags.append(flag)
        pdf["suppress_thresh"] = pd.Series(flags, dtype=bool)
        return pdf

    return fn


def _xbit_group(ruleset: RuleSet):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(_SORT).reset_index(drop=True)
        state: dict[str, int] = {}        # name → expire_at epoch (0=unset)
        flags = []
        for t, ridx in zip(pdf["epoch"].tolist(),
                           pdf["rule_idx"].tolist()):
            rule = ruleset.rules[ridx]
            n_isset = n_isnotset = ok_isset = ok_isnotset = 0
            for xb in rule.xbits:
                if xb.action == "isset":
                    n_isset += 1
                    exp = state.get(xb.name, 0)
                    if exp != 0 and t < exp:     # xbit-mmap.c:203-210
                        ok_isset += 1
                elif xb.action == "isnotset":
                    n_isnotset += 1
                    exp = state.get(xb.name, 0)
                    if not (exp != 0 and t < exp):
                        ok_isnotset += 1
            passed = ok_isset == n_isset and ok_isnotset == n_isnotset
            if passed:                    # set/unset post-match (engine.c:1560)
                for xb in rule.xbits:
                    if xb.action == "set":
                        state[xb.name] = t + xb.expire   # xbit-mmap.c:99
                    elif xb.action == "unset":
                        if xb.name in state:
                            state[xb.name] = 0           # xbit-mmap.c:168
            flags.append(passed)
        pdf["xbit_pass"] = pd.Series(flags, dtype=bool)
        return pdf

    return fn


def run_correlate(matches, ruleset: RuleSet):
    """matches (MATCH_SCHEMA) → matches + suppression flags (CORR_SCHEMA)."""
    from pyspark.sql import functions as F

    validate_ruleset_for_spark(ruleset)
    df = (matches
          .withColumn("suppress_after", F.lit(False))
          .withColumn("suppress_thresh", F.lit(False))
          .withColumn("xbit_pass", F.lit(True)))

    # stage gating is driver-side from the compiled ruleset — no Spark
    # actions are triggered while building the plan
    if any(r.after for r in ruleset.rules):
        has_after = df.filter(F.col("after_key").isNotNull())
        no_after = df.filter(F.col("after_key").isNull())
        has_after = has_after.groupBy("sid", "rev", "after_key").applyInPandas(
            _after_group(ruleset), schema=CORR_SCHEMA)
        df = no_after.unionByName(has_after)

    # threshold: after-suppressed rows never reach the threshold counter
    # (engine.c:1528: Threshold2 called only when after_log_flag == false)
    if any(r.threshold for r in ruleset.rules):
        has_t = df.filter(F.col("thresh_key").isNotNull() &
                          ~F.col("suppress_after"))
        rest = df.filter(F.col("thresh_key").isNull() |
                         F.col("suppress_after"))
        has_t = has_t.groupBy("sid", "thresh_key").applyInPandas(
            _threshold_group(ruleset), schema=CORR_SCHEMA)
        df = rest.unionByName(has_t)

    # xbits
    if any(r.xbits for r in ruleset.rules):
        has_x = df.filter(F.col("xbit_key").isNotNull())
        no_x = df.filter(F.col("xbit_key").isNull())
        has_x = has_x.groupBy("xbit_key").applyInPandas(
            _xbit_group(ruleset), schema=CORR_SCHEMA)
        df = no_x.unionByName(has_x)
    return df
