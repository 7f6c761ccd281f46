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

Requires conv-derived correlation keys — IP-extracted keys would need a
second keyed stage; rejected at plan time like the batch fast path's
precondition.  Rulesets whose only cross-conv state is 'none'-direction
flexbit sharing run in a single global state group instead.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from .correlate import (
    CORR_SCHEMA,
    CorrState,
    FlexStore,
    apply_fold_to_batches,
    conv_keyed_only,
    unified_fold,
    validate_ruleset_for_spark,
)
from .datagen import TRANSCRIPTS_SCHEMA
from .match import MATCH_SCHEMA, build_matcher, candidate_filter
from .parse import parse_transcripts, split_ignored
from .rules.compiler import RuleSet

# GroupState layout: one JSON blob (the four stores, key-stringified)
STATE_SCHEMA = "state string"


def _encode_state(st: CorrState) -> str:
    return json.dumps({
        "a": [[list(k), v] for k, v in st.after.items()],
        "t": [[list(k), v] for k, v in st.thresh.items()],
        "x": [[list(k), v] for k, v in st.xbit.items()],
        "f": st.flex.dump(),
    })


def _decode_state(blob: str) -> CorrState:
    d = json.loads(blob)
    st = CorrState()
    st.after = {tuple(k): v for k, v in d.get("a", [])}
    st.thresh = {tuple(k): v for k, v in d.get("t", [])}
    st.xbit = {tuple(k): v for k, v in d.get("x", [])}
    st.flex = FlexStore.load(d.get("f", []))
    return st


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


def _stateful_correlator(ruleset: RuleSet, timeout_ms: int = 0):
    """applyInPandasWithState function: per group (conv_id, or the single
    global group for 'none'-flexbit rulesets), fold the micro-batch's
    rows (sorted deterministically) through the same unified engine-order
    fold as batch, persisting the stores in the GroupState across
    micro-batches.  Store entries are evicted by EVENT time via
    _make_pruner on every invocation."""
    fold = unified_fold(ruleset)
    prune = _make_pruner(ruleset)

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        st = _decode_state(state.get[0]) if state.exists else CorrState()
        max_epoch = 0

        def batches():
            nonlocal max_epoch
            for pdf in pdfs:
                if "_grp" in pdf.columns:
                    pdf = pdf.drop(columns=["_grp"])
                if len(pdf):
                    max_epoch = max(max_epoch, int(pdf["epoch"].max()))
                yield (pdf.sort_values(["epoch", "conv_id", "turn_idx",
                                        "rule_idx"])
                       .reset_index(drop=True))

        yield from apply_fold_to_batches(fold, st, batches())
        if max_epoch:
            prune(st, max_epoch)
        state.update((_encode_state(st),))
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
                     state_timeout_ms: int | None = None):
    """transcripts stream → correlated alert stream (CORR_SCHEMA rows that
    survive suppression are the emit set; filtering/enrichment happens in
    the sink's foreachBatch).

    ``state_timeout_ms=None`` (default) derives the eviction timeout from
    the ruleset's largest window (default_state_timeout_ms); pass 0 to
    explicitly opt out of eviction."""
    from pyspark.sql import functions as F

    validate_ruleset_for_spark(ruleset)
    # grouping: per-conv state groups on the fast path; rulesets whose
    # ONLY cross-conv state is 'none'-direction flexbit sharing
    # (flexbit-mmap.c:124 matches any src/dst) route through a single
    # global group — exact, serial over matched rows only
    if conv_keyed_only(ruleset):
        group_col = None
    elif conv_keyed_only(ruleset, ignore_none_flexbits=True):
        group_col = "_grp"
    else:
        raise ValueError("streaming correlator requires conv-derived "
                         "correlation keys (conv_keyed_only)")
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
    if group_col is None:
        grouped = base.groupBy("conv_id")
    else:
        grouped = (base.withColumn(group_col, F.lit("__global__"))
                   .groupBy(group_col))
    return grouped.applyInPandasWithState(
        _stateful_correlator(ruleset, state_timeout_ms),
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
