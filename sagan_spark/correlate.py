"""Stage 5 — CORRELATE: after / threshold / xbit stateful semantics.

The reference keeps this state in mmap'd shared memory keyed by
Djb2(track-string) (/root/reference/src/after.c, src/threshold.c,
src/xbit-mmap.c).  Here each state key becomes a Spark partition-local
dict entry:

* ``after``      — key (sid, rev, after_key)   [after.c:113-117 matches
                   hash + sid + rev]
* ``threshold``  — key (sid, thresh_key)       [threshold.c:118-121
                   matches hash + sid only — rev is NOT part of the key]
* ``xbits``      — key xbit_key (track value); the store key is
                   (name, value) (xbit-mmap.c:88-91), so one partition
                   sees every interacting set/unset/isset row.

Execution strategy (scale notes):

* Each stage is ``repartition(key) → sortWithinPartitions(key, epoch,
  conv_id, turn_idx, rule_idx) → mapInPandas`` — ONE shuffle of the
  matched rows (a small fraction of input), then a single linear pass per
  partition.  No per-group Arrow round-trips: grouped ``applyInPandas``
  costs ~10 ms *per group* in pandas/Arrow overhead, which at millions of
  correlation keys dominates wall-clock; ``mapInPandas`` amortizes that to
  one batch stream per partition, with the state dict carried across
  batches (the iterator spans the whole partition).
* Rows with a NULL stage key pass through unchanged; they are salted by
  (conv_id, sid) in the repartition expression so they spread across
  partitions instead of hashing to one (skew guard).
* Deterministic (epoch, conv_id, turn_idx, rule_idx) order inside each
  key — the batch replacement for the reference's wall-clock arrival
  order (SURVEY §2.6).
* The reference's data-dependent reset anchoring (after.c:130-137 resets
  from the *window anchor*, threshold.c:131 rolls the anchor on every
  event) is a sequential fold — not expressible as a sliding-window SQL
  aggregate, exactly as SURVEY §4.3 planned.

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


def _after_fold(ruleset: RuleSet):
    """Per-key fold of Sagan_After2 (after.c:51-229): suppress until
    count > C within the anchored window; window anchor resets on expiry
    (after.c:130-137) and rolls on every fire (after.c:140-147)."""
    def fold(pdf: pd.DataFrame, state: dict) -> list[bool]:
        flags = []
        for key, t, ridx in zip(
                zip(pdf["sid"].tolist(), pdf["rev"].tolist(),
                    pdf["after_key"].tolist()),
                pdf["epoch"].tolist(), pdf["rule_idx"].tolist()):
            if key[2] is None:
                flags.append(False)
                continue
            spec = ruleset.rules[ridx].after
            st = state.get(key)
            if st is None:                 # add-new-entry path (after.c:155+)
                state[key] = [1, t]
                flags.append(True)
                continue
            cnt, utime = st[0] + 1, st[1]
            flag = True
            if t - utime > spec.seconds:   # window-anchor reset (after.c:130)
                cnt, utime, flag = 1, t, True
            if spec.count < cnt:           # fire (after.c:140-147)
                utime, flag = t, False
            st[0], st[1] = cnt, utime
            flags.append(flag)
        return flags
    return fold


def _threshold_fold(ruleset: RuleSet):
    """Per-key fold of Threshold2 (threshold.c:54-231): emit until
    count > C; anchor rolls to every event's time (threshold.c:131)."""
    def fold(pdf: pd.DataFrame, state: dict) -> list[bool]:
        flags = []
        for key, t, ridx in zip(
                zip(pdf["sid"].tolist(), pdf["thresh_key"].tolist()),
                pdf["epoch"].tolist(), pdf["rule_idx"].tolist()):
            if key[1] is None:
                flags.append(False)
                continue
            spec = ruleset.rules[ridx].threshold
            st = state.get(key)
            if st is None:
                state[key] = [1, t]
                flags.append(False)
                continue
            cnt, utime = st[0] + 1, st[1]
            oldtime = t - utime
            utime = t                      # rolling anchor (threshold.c:131)
            flag = False
            if oldtime > spec.seconds:
                cnt, flag = 1, False
            if spec.count < cnt:           # suppress (threshold.c:138-147)
                flag = True
            st[0], st[1] = cnt, utime
            flags.append(flag)
        return flags
    return fold


def _xbit_fold(ruleset: RuleSet):
    """Per-key xbit store: name → expire-at epoch (0 = unset); isset /
    isnotset gate (xbit-mmap.c:203-210), set/unset fire post-match
    (engine.c:1560-1565, xbit-mmap.c:99/168)."""
    def fold(pdf: pd.DataFrame, state: dict) -> list[bool]:
        flags = []
        for key, t, ridx in zip(pdf["xbit_key"].tolist(),
                                pdf["epoch"].tolist(),
                                pdf["rule_idx"].tolist()):
            if key is None:
                flags.append(True)
                continue
            rule = ruleset.rules[ridx]
            store = state.setdefault(key, {})
            passed = True
            for xb in rule.xbits:
                exp = store.get(xb.name, 0)
                is_set = exp != 0 and t < exp
                if (xb.action == "isset" and not is_set) or \
                        (xb.action == "isnotset" and is_set):
                    passed = False
            if passed:
                for xb in rule.xbits:
                    if xb.action == "set":
                        store[xb.name] = t + xb.expire   # xbit-mmap.c:99
                    elif xb.action == "unset":
                        store[xb.name] = 0               # xbit-mmap.c:168
            flags.append(passed)
        return flags
    return fold


def _run_stage(df, key_cols: list[str], fold_factory, flag_col: str,
               ruleset: RuleSet):
    """One stateful stage: shuffle by key (NULL keys salted by
    (conv_id, sid) to avoid a degenerate partition), sort within
    partitions, single mapInPandas pass with cross-batch state."""
    from pyspark.sql import functions as F

    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    part_expr = F.when(
        F.col(key_cols[-1]).isNull(),
        F.concat_ws("\x1f", F.lit("\x00null"), F.col("conv_id"),
                    F.col("sid").cast("string"))).otherwise(key)
    rep = (df.repartition(part_expr)
             .sortWithinPartitions(*key_cols, *_SORT))
    fold = fold_factory(ruleset)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict = {}
        for pdf in batches:
            pdf[flag_col] = pd.Series(fold(pdf, state), dtype=bool,
                                      index=pdf.index)
            yield pdf

    return rep.mapInPandas(run, schema=CORR_SCHEMA)


def conv_keyed_only(ruleset: RuleSet) -> bool:
    """True when every stateful rule's correlation keys are functions of
    conv_id alone (the host-fallback path, engine.c:967-1045): no
    parse_src_ip/parse_dst_ip/parse_port/normalize on a rule that has
    after/threshold/xbits.  Then ONE conv_id-hash repartition co-locates
    every correlation key — the north star's explicit conv_id
    partitioning — and all three folds run in a single shuffle+pass."""
    for r in ruleset.rules:
        if (r.after or r.threshold or r.xbits) and (
                r.parse_src_ip or r.parse_dst_ip or r.parse_port or
                r.normalize):
            return False
    return True


def _combined_runner(ruleset: RuleSet, has_after: bool, has_thresh: bool,
                     has_xbit: bool):
    fold_a = _after_fold(ruleset)
    fold_t = _threshold_fold(ruleset)
    fold_x = _xbit_fold(ruleset)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sa: dict = {}
        st: dict = {}
        sx: dict = {}
        for pdf in batches:
            if has_after:
                pdf["suppress_after"] = pd.Series(
                    fold_a(pdf, sa), dtype=bool, index=pdf.index)
            if has_thresh:
                # after-suppressed rows skip the threshold counter
                # (engine.c:1528); mask their key to None for the fold
                masked = pdf["thresh_key"].where(
                    ~pdf["suppress_after"], None)
                pdf["suppress_thresh"] = pd.Series(
                    fold_t(pdf.assign(thresh_key=masked), st),
                    dtype=bool, index=pdf.index)
            if has_xbit:
                pdf["xbit_pass"] = pd.Series(
                    fold_x(pdf, sx), dtype=bool, index=pdf.index)
            yield pdf

    return run


def run_correlate(matches, ruleset: RuleSet):
    """matches (MATCH_SCHEMA) → matches + suppression flags (CORR_SCHEMA).

    Fast path (all correlation keys conv-derived — the common transcript
    case): ONE repartition(conv_id) + sortWithinPartitions + a single
    mapInPandas running the after/threshold/xbit folds back-to-back.
    One shuffle of matched rows, one Arrow round-trip, no persists.

    General path (IP-extracted keys): one keyed stage per clause type —
    the Arrow round-trip and shuffle are paid ONLY for rows carrying the
    stage's key (measured: a full-frame mapInPandas costs ~10 s per 5.7M
    wide rows, the keyed subset is typically a small fraction).  The
    matched frame and each folded output are persisted MEMORY_AND_DISK so
    the filter/union branches are cache reads, never matcher recomputes."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    validate_ruleset_for_spark(ruleset)
    df = (matches
          .withColumn("suppress_after", F.lit(False))
          .withColumn("suppress_thresh", F.lit(False))
          .withColumn("xbit_pass", F.lit(True)))

    has_after = any(r.after for r in ruleset.rules)
    has_thresh = any(r.threshold for r in ruleset.rules)
    has_xbit = any(r.xbits for r in ruleset.rules)
    if not (has_after or has_thresh or has_xbit):
        return df

    if conv_keyed_only(ruleset):
        rep = (df.repartition(F.col("conv_id"))
                 .sortWithinPartitions("conv_id", "epoch", "turn_idx",
                                       "rule_idx"))
        return rep.mapInPandas(
            _combined_runner(ruleset, has_after, has_thresh, has_xbit),
            schema=CORR_SCHEMA)

    df = df.persist(StorageLevel.MEMORY_AND_DISK)

    if has_after:
        keyed = df.filter(F.col("after_key").isNotNull())
        folded = _run_stage(keyed, ["sid", "rev", "after_key"], _after_fold,
                            "suppress_after", ruleset) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        df = df.filter(F.col("after_key").isNull()).unionByName(folded)

    # threshold: after-suppressed rows never reach the threshold counter
    # (engine.c:1528: Threshold2 called only when after_log_flag == false)
    if has_thresh:
        keyed = df.filter(F.col("thresh_key").isNotNull() &
                          ~F.col("suppress_after"))
        rest = df.filter(F.col("thresh_key").isNull() |
                         F.col("suppress_after"))
        folded = _run_stage(keyed, ["sid", "thresh_key"], _threshold_fold,
                            "suppress_thresh", ruleset) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        df = rest.unionByName(folded)

    if has_xbit:
        keyed = df.filter(F.col("xbit_key").isNotNull())
        folded = _run_stage(keyed, ["xbit_key"], _xbit_fold, "xbit_pass",
                            ruleset) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        df = df.filter(F.col("xbit_key").isNull()).unionByName(folded)
    return df
