"""Structured Streaming variant of the pipeline (SURVEY §2.9, S1 streaming
mode) — the FIFO-tail deployment of the reference (`fopen` loop over a
named pipe, /root/reference/src/sagan.c:1142-1345) re-expressed as:

    readStream (file source over the transcripts directory)
      → PARSE / IGNORE     (same narrow codegen expressions as batch)
      → MATCH              (same stateless vectorized mapInPandas matcher)
      → CORRELATE          (applyInPandasWithState keyed by conv_id — the
                            streaming analog of the batch conv-partition
                            fold; state = the after/threshold/xbit dicts,
                            JSON-encoded in the GroupState, with a
                            processing-time timeout as the eviction path
                            that the reference implements via
                            Clean_IPC_Object, src/ipc.c:79-200)
      → ROUTE              (foreachBatch fan-out to the same sinks)

Watermark note: the reference has NO event-time semantics — correlation
windows use wall-clock arrival (after.c:63-80).  The batch engine made
that deterministic via (epoch, turn_idx) ordering; streaming preserves
arrival-order semantics per micro-batch by sorting each group's rows on
(epoch, turn_idx, rule_idx) before folding, so replaying the same file
sequence reproduces the batch result (tested in
tests/test_streaming.py).

Requires ``conv_keyed_only(ruleset)`` — IP-extracted correlation keys
would need a second keyed stage; rejected at plan time like the batch
fast path's precondition.
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


def _stateful_correlator(ruleset: RuleSet, timeout_ms: int = 0):
    """applyInPandasWithState function: per conv_id group, fold the
    micro-batch's rows (sorted deterministically) through the same
    unified engine-order fold as batch, persisting the stores in the
    GroupState across micro-batches."""
    fold = unified_fold(ruleset)

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        st = _decode_state(state.get[0]) if state.exists else CorrState()
        sorted_batches = (
            pdf.sort_values(["epoch", "turn_idx", "rule_idx"])
               .reset_index(drop=True) for pdf in pdfs)
        yield from apply_fold_to_batches(fold, st, sorted_batches)
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
    if not conv_keyed_only(ruleset):
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
    return (base.groupBy("conv_id")
            .applyInPandasWithState(
                _stateful_correlator(ruleset, state_timeout_ms),
                outputStructType=CORR_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=timeout))


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
