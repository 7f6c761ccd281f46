"""Structured Streaming variant of the pipeline (SURVEY §2.9, S1 streaming
mode) — the FIFO-tail deployment of the reference (`fopen` loop over a
named pipe, /root/reference/src/sagan.c:1142-1345) re-expressed as:

    readStream (file source over the transcripts directory)
      → PARSE / IGNORE     (same narrow codegen expressions as batch)
      → MATCH              (same stateless vectorized mapInPandas matcher)
      → CORRELATE          (applyInPandasWithState keyed by conv_id — the
                            streaming analog of the batch conv-partition
                            fold; state = the after/threshold/xbit dicts,
                            JSON-encoded in the GroupState.  Store ENTRIES
                            evict by EVENT time (_make_pruner — the
                            Clean_IPC_Object analog, src/ipc.c:79-200);
                            the processing-time timeout only GCs whole
                            groups, so a stalled or backfilled source
                            cannot lose event-time-live entries unless the
                            conv itself goes wall-clock silent)
      → ROUTE              (foreachBatch fan-out to the same sinks)

Watermark note: the reference has NO event-time semantics — correlation
windows use wall-clock arrival (after.c:63-80).  The batch engine made
that deterministic via (epoch, turn_idx) ordering; streaming preserves
arrival-order semantics per micro-batch by sorting each group's rows on
(epoch, turn_idx, rule_idx) before folding, so replaying the same file
sequence reproduces the batch result (tested in
tests/test_streaming.py).

Key routing mirrors the batch engine's two paths:

* conv-derived keys (fast path) → one applyInPandasWithState keyed by
  conv_id running the unified engine-order fold;
* IP-extracted keys (the reference's primary deployment mode) → the
  STAGED-GENERAL streaming path: outside the fast path the validator
  rejects cross-clause rules, so every matched row carries a single
  composite state key ("x"+xbit_key, "f"+flexbit name-group,
  "a"+sid+track-value, or — for after+threshold with DIFFERENT tracks
  on one rule, whose two stores are both sid-scoped — "d"+sid); one
  applyInPandasWithState keyed by that composite dispatches the per-kind
  fold — the streaming analog of the batch path's per-stage _run_stage
  shuffles.  Stateless rows bypass state entirely (filter + union).

Event-time bound (the one the pruner assumes): store eviction is exact
while event-time disorder stays within ONE horizon (the largest rule
window) of the max epoch each state group has ever seen — the max is
persisted in the GroupState, so the bound spans micro-batches.  A source
backfilling OLDER than that may consult already-pruned entries; such rows
are counted in the ``late_rows`` accumulator (streaming_alerts attaches
one; see its docstring) so silent state loss is observable.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from .correlate import (
    CORR_SCHEMA,
    CorrState,
    FlexStore,
    _SORT,
    apply_fold_to_batches,
    conv_keyed_only,
    general_group_key_col,
    unified_fold,
    validate_ruleset_for_spark,
)
from .datagen import TRANSCRIPTS_SCHEMA
from .match import MATCH_SCHEMA, build_matcher, candidate_filter
from .parse import parse_transcripts, split_ignored
from .rules.compiler import RuleSet

# GroupState layout: one JSON blob (the four stores, key-stringified)
STATE_SCHEMA = "state string"


def _encode_state(st: CorrState, max_epoch: int = 0) -> str:
    return json.dumps({
        "a": [[list(k), v] for k, v in st.after.items()],
        "t": [[list(k), v] for k, v in st.thresh.items()],
        "x": [[list(k), v] for k, v in st.xbit.items()],
        "f": st.flex.dump(),
        "m": max_epoch,   # max event epoch ever seen (pruner anchor)
    })


def _decode_state(blob: str) -> tuple[CorrState, int]:
    d = json.loads(blob)
    st = CorrState()
    st.after = {tuple(k): v for k, v in d.get("a", [])}
    st.thresh = {tuple(k): v for k, v in d.get("t", [])}
    st.xbit = {tuple(k): v for k, v in d.get("x", [])}
    st.flex = FlexStore.load(d.get("f", []))
    return st, int(d.get("m", 0))


def default_state_timeout_ms(ruleset: RuleSet) -> int:
    """Eviction default: 2× the largest rule window (after/threshold
    seconds, xbit/flexbit expire) — the streaming analog of the
    reference's Clean_IPC_Object stale-entry eviction (src/ipc.c:79-200).
    Without a timeout, per-conv GroupState would grow unboundedly across
    the conv_id keyspace in a long-running stream."""
    horizon = 0
    for r in ruleset.rules:
        if r.after:
            horizon = max(horizon, r.after.seconds)
        if r.threshold:
            horizon = max(horizon, r.threshold.seconds)
        for xb in r.xbits:
            horizon = max(horizon, xb.expire)
        for fb in r.flexbits:
            horizon = max(horizon, fb.timeout)
    return 2 * horizon * 1000 if horizon else 3600_000


def _make_pruner(ruleset: RuleSet):
    """Event-time state eviction (the Clean_IPC_Object analog,
    src/ipc.c:79-200, driven by EVENT epochs instead of wall clock):
    drops store entries whose liveness window ended more than one full
    horizon before the max event epoch seen by this group — exact under
    event-time disorder bounded by the horizon (one largest-window's
    worth of backfill), and the real per-group state-size bound; the
    processing-time GroupState timeout then only GCs groups wholesale.

    Flexbit entries are pruned ONLY when the ruleset has no `count`
    clause: count is expiry-agnostic (flexbit-mmap.c:683-744 checks
    neither state nor expiry) and counts entry CREATIONS, so dropping an
    expired entry that a later `set` would have merely updated would
    double-count it."""
    horizon = default_state_timeout_ms(ruleset) // 2000  # largest window
    after_w = {(r.sid, r.rev): r.after.seconds
               for r in ruleset.rules if r.after}
    thresh_w = {r.sid: r.threshold.seconds
                for r in ruleset.rules if r.threshold}
    flex_ok = not any(fb.action == "count"
                      for r in ruleset.rules for fb in r.flexbits)

    def prune(st: CorrState, max_epoch: int) -> None:
        cut = max_epoch - horizon
        st.after = {k: v for k, v in st.after.items()
                    if v[1] + after_w.get((k[0], k[1]), 0) >= cut}
        st.thresh = {k: v for k, v in st.thresh.items()
                     if v[1] + thresh_w.get(k[0], 0) >= cut}
        st.xbit = {k: exp for k, exp in st.xbit.items() if exp >= cut}
        if flex_ok:
            keep = [(name, e) for name, e in st.flex.dump() if e[4] >= cut]
            st.flex = FlexStore.load(keep)

    return prune


def _stateful_correlator(ruleset: RuleSet, timeout_ms: int = 0,
                         late_rows=None):
    """applyInPandasWithState function: per group (conv_id, or the single
    global group for 'none'-flexbit rulesets), fold the micro-batch's
    rows (sorted deterministically) through the same unified engine-order
    fold as batch, persisting the stores in the GroupState across
    micro-batches.  Store entries are evicted by EVENT time via
    _make_pruner on every invocation, anchored to the max epoch the group
    has EVER seen (persisted in the state blob) — rows older than one
    horizon behind that anchor may consult already-pruned entries and are
    tallied into the ``late_rows`` accumulator."""
    fold = unified_fold(ruleset)
    prune = _make_pruner(ruleset)
    horizon = default_state_timeout_ms(ruleset) // 2000

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        st, max_epoch = (_decode_state(state.get[0]) if state.exists
                         else (CorrState(), 0))

        def batches():
            nonlocal max_epoch
            for pdf in pdfs:
                if "_grp" in pdf.columns:
                    pdf = pdf.drop(columns=["_grp"])
                if len(pdf):
                    if late_rows is not None and max_epoch:
                        late = int((pdf["epoch"] <
                                    max_epoch - horizon).sum())
                        if late:
                            late_rows.add(late)
                    max_epoch = max(max_epoch, int(pdf["epoch"].max()))
                yield (pdf.sort_values(["epoch", "conv_id", "turn_idx",
                                        "rule_idx"])
                       .reset_index(drop=True))

        yield from apply_fold_to_batches(fold, st, batches())
        if max_epoch:
            prune(st, max_epoch)
        state.update((_encode_state(st, max_epoch),))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)

    return fn


# ---------------------------------------------------------------------------
# staged-general streaming path (IP-extracted keys, SURVEY §2.9 on the
# reference's primary deployment mode).  Group key + precondition are
# SHARED with the batch composite-key path (correlate.general_group_key_col
# / dual_track_rules), and the fold is the same unified engine-order
# fold — batch and streaming cannot diverge on general-path semantics.
# ---------------------------------------------------------------------------


def _general_stateful_correlator(ruleset: RuleSet, timeout_ms: int = 0,
                                 late_rows=None):
    """applyInPandasWithState function for composite state-group keys.
    One micro-batch's group rows are concatenated and sorted ONCE (a
    group is one state key — one IP / one name-group — so the per-batch
    row set is small and the global sort keeps cross-chunk order exact),
    then folded through unified_fold with the stores persisted in the
    GroupState."""
    fold = unified_fold(ruleset)
    prune = _make_pruner(ruleset)
    horizon = default_state_timeout_ms(ruleset) // 2000

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        st, max_epoch = (_decode_state(state.get[0]) if state.exists
                         else (CorrState(), 0))
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = (pd.concat(chunks, ignore_index=True)
                   .drop(columns=["_gkey"])
                   .sort_values(_SORT).reset_index(drop=True))
            if late_rows is not None and max_epoch:
                late = int((pdf["epoch"] < max_epoch - horizon).sum())
                if late:
                    late_rows.add(late)
            max_epoch = max(max_epoch, int(pdf["epoch"].max()))
            sup_a, sup_t, xp, fp = fold(pdf, st)
            pdf["suppress_after"] = pd.Series(sup_a, dtype=bool)
            pdf["suppress_thresh"] = pd.Series(sup_t, dtype=bool)
            pdf["xbit_pass"] = pd.Series(xp, dtype=bool)
            pdf["flexbit_pass"] = pd.Series(fp, dtype=bool)
            yield pdf
        if max_epoch:
            prune(st, max_epoch)
        state.update((_encode_state(st, max_epoch),))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)

    return fn


def read_transcript_stream(spark, path: str, max_files: int = 10):
    """File-source stream over a transcripts parquet directory — the
    FIFO-tail analog (new files == new log lines)."""
    return (spark.readStream
            .schema(TRANSCRIPTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files)
            .parquet(path))


def streaming_alerts(spark, transcripts_stream, ruleset: RuleSet,
                     state_timeout_ms: int | None = None,
                     late_rows=None):
    """transcripts stream → correlated alert stream (CORR_SCHEMA rows that
    survive suppression are the emit set; filtering/enrichment happens in
    the sink's foreachBatch).

    ``state_timeout_ms=None`` (default) derives the eviction timeout from
    the ruleset's largest window (default_state_timeout_ms); pass 0 to
    explicitly opt out of eviction.

    ``late_rows``: optional Spark accumulator; rows arriving with
    epoch < a group's persisted max epoch - horizon (the bound under
    which event-time eviction is exact) are tallied into it, so backfill
    deeper than one horizon is observable instead of silently consulting
    pruned state.  Pass ``spark.sparkContext.accumulator(0)``."""
    from pyspark.sql import functions as F

    validate_ruleset_for_spark(ruleset)
    # grouping: per-conv state groups on the fast path; rulesets whose
    # ONLY cross-conv state is 'none'-direction flexbit sharing
    # (flexbit-mmap.c:124 matches any src/dst) route through a single
    # global group; IP-extracted keys take the staged-general composite
    # key (one state group per row; dual-track rules get a per-sid group)
    if conv_keyed_only(ruleset):
        group_col = None
    elif conv_keyed_only(ruleset, ignore_none_flexbits=True):
        group_col = "_grp"
    else:
        # after+threshold with DIFFERENT tracks on one rule (the batch
        # staged-fallback shape) also streams: general_group_key_col
        # routes those rules' rows to one "d"+sid group — both stores
        # are sid-scoped, so a per-sid group co-locates all state either
        # can touch, at the cost of serializing that rule's rows through
        # one state group (streaming cannot chain two stateful stages)
        group_col = "_gkey"
    if state_timeout_ms is None:
        state_timeout_ms = default_state_timeout_ms(ruleset)
    parsed = parse_transcripts(transcripts_stream)
    kept, _ = split_ignored(parsed, ruleset.ignore_list)
    needed = kept.select("conv_id", "turn_idx", "role", "text", "tool",
                         "ts", "epoch")
    pref = candidate_filter(ruleset)
    if pref is not None:
        needed = needed.filter(pref)
    matches = needed.mapInPandas(build_matcher(ruleset),
                                 schema=MATCH_SCHEMA)
    stateful = any(r.after or r.threshold or r.xbits or r.flexbits
                   for r in ruleset.rules)
    base = (matches
            .withColumn("suppress_after", F.lit(False))
            .withColumn("suppress_thresh", F.lit(False))
            .withColumn("xbit_pass", F.lit(True))
            .withColumn("flexbit_pass", F.lit(True)))
    if not stateful:
        return base
    timeout = ("ProcessingTimeTimeout" if state_timeout_ms
               else "NoTimeout")
    if group_col == "_gkey":
        keyed = base.withColumn(group_col,
                                general_group_key_col(ruleset))
        # stateless rows (no live state key) bypass the store entirely —
        # the streaming analog of the batch path's filter/union branches
        passthru = (keyed.filter(F.col(group_col).isNull())
                    .drop(group_col))
        folded = (keyed.filter(F.col(group_col).isNotNull())
                  .groupBy(group_col)
                  .applyInPandasWithState(
                      _general_stateful_correlator(
                          ruleset, state_timeout_ms, late_rows),
                      outputStructType=CORR_SCHEMA,
                      stateStructType=STATE_SCHEMA,
                      outputMode="append",
                      timeoutConf=timeout))
        return folded.unionByName(passthru)
    if group_col is None:
        grouped = base.groupBy("conv_id")
    else:
        grouped = (base.withColumn(group_col, F.lit("__global__"))
                   .groupBy(group_col))
    return grouped.applyInPandasWithState(
        _stateful_correlator(ruleset, state_timeout_ms, late_rows),
        outputStructType=CORR_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout)


def run_stream_to_parquet(spark, in_path: str, out_path: str,
                          ruleset: RuleSet, checkpoint: str):
    """Start the streaming query writing emitted alerts to parquet with a
    checkpoint (restart-safe exactly-once file sink)."""
    from pyspark.sql import functions as F

    alerts = streaming_alerts(spark, read_transcript_stream(spark, in_path),
                              ruleset)
    emitted = alerts.filter(
        F.col("xbit_pass") & F.col("flexbit_pass") &
        ~F.col("suppress_after") & ~F.col("suppress_thresh"))
    return (emitted.writeStream
            .format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .start())
