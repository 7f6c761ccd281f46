"""Streaming variant: replaying the transcript files through the
Structured Streaming pipeline must reproduce the batch engine's emitted
set (same rows, same suppression decisions), including when the input
arrives split across multiple micro-batches with state carried in the
GroupState between them."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sagan_spark.correlate import run_correlate
from sagan_spark.datagen import gen_rows
from sagan_spark.match import run_match
from sagan_spark.parse import parse_transcripts, split_ignored
from sagan_spark.rules.compiler import compile_ruleset_from_dir
from sagan_spark.streaming import read_transcript_stream, streaming_alerts

EMIT_COLS = ["conv_id", "turn_idx", "sid", "suppress_after",
             "suppress_thresh", "xbit_pass", "flexbit_pass"]


@pytest.fixture(scope="module")
def ruleset():
    return compile_ruleset_from_dir(
        os.path.join(os.path.dirname(__file__), "..", "rules-entry"))


def _batch_result(spark, rows, ruleset) -> pd.DataFrame:
    df = spark.createDataFrame(pd.DataFrame(rows))
    parsed = parse_transcripts(df)
    kept, _ = split_ignored(parsed, ruleset.ignore_list)
    corr = run_correlate(run_match(kept, ruleset), ruleset)
    return (corr.select(*EMIT_COLS).toPandas()
            .sort_values(EMIT_COLS).reset_index(drop=True))


def _stream_result(spark, in_dir, ruleset, max_files) -> pd.DataFrame:
    stream = read_transcript_stream(spark, in_dir, max_files=max_files)
    # state_timeout_ms=0: explicit eviction opt-out so
    # processAllAvailable() settles (the default ProcessingTimeTimeout
    # keeps scheduling no-data cleanup batches); the default path is
    # covered by test_default_state_timeout
    corr = streaming_alerts(spark, stream, ruleset, state_timeout_ms=0)
    q = (corr.select(*EMIT_COLS).writeStream
         .format("memory").queryName("stream_out")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (spark.table("stream_out").toPandas()
            .sort_values(EMIT_COLS).reset_index(drop=True))


def _write_chunks(spark, rows, out_dir, n_chunks):
    """Chunk by turn ranges so arrival order == epoch order per conv
    (mirrors tail-ing a live log), with distinct mtimes so the file
    source replays chunks in order."""
    pdf = pd.DataFrame(rows)
    bounds = sorted(pdf["turn_idx"].unique())
    per = max(1, len(bounds) // n_chunks)
    os.makedirs(out_dir, exist_ok=True)
    for k in range(n_chunks):
        lo = k * per
        hi = (k + 1) * per if k < n_chunks - 1 else 10 ** 9
        chunk = pdf[(pdf["turn_idx"] >= lo) & (pdf["turn_idx"] < hi)]
        if not len(chunk):
            continue
        (spark.createDataFrame(chunk)
         .withColumn("turn_idx", F.col("turn_idx").cast("int"))
         .coalesce(1).write.mode("append").parquet(out_dir))
        time.sleep(1.1)  # distinct mtime ordering for the file source


def test_stream_equals_batch_single_microbatch(spark, ruleset, tmp_path):
    rows = gen_rows(40)
    in_dir = str(tmp_path / "stream_in1")
    (spark.createDataFrame(pd.DataFrame(rows))
     .withColumn("turn_idx", F.col("turn_idx").cast("int"))
     .write.parquet(in_dir))
    batch = _batch_result(spark, rows, ruleset)
    stream = _stream_result(spark, in_dir, ruleset, max_files=100)
    pd.testing.assert_frame_equal(batch, stream)


def test_stream_equals_batch_across_microbatches(spark, ruleset, tmp_path):
    rows = gen_rows(12)
    in_dir = str(tmp_path / "stream_in2")
    _write_chunks(spark, rows, in_dir, n_chunks=3)
    batch = _batch_result(spark, rows, ruleset)
    stream = _stream_result(spark, in_dir, ruleset, max_files=1)
    pd.testing.assert_frame_equal(batch, stream)


def test_stream_ipkeys_equal_batch(spark, tmp_path):
    """IP-extracted correlation keys — the reference's PRIMARY deployment
    mode (after.c:108-110 hashes extracted addresses) — stream through
    the staged-general composite-key correlator and reproduce the batch
    general path exactly, state carried across micro-batches."""
    rs = compile_ruleset_from_dir(
        os.path.join(os.path.dirname(__file__), "..", "rules-entry",
                     "ipkeys"))
    rows = gen_rows(12)
    in_dir = str(tmp_path / "stream_ipkeys")
    _write_chunks(spark, rows, in_dir, n_chunks=3)
    batch = _batch_result(spark, rows, rs)
    stream = _stream_result(spark, in_dir, rs, max_files=1)
    # every stage kind must flip at least once or state isn't exercised
    assert (batch["suppress_after"]).any()
    assert set(batch["xbit_pass"].unique()) == {True, False}
    assert set(batch["flexbit_pass"].unique()) == {True, False}
    pd.testing.assert_frame_equal(batch, stream)


def test_stream_dual_track_equal_batch(spark, tmp_path):
    """after + threshold with DIFFERENT tracks on one rule — the batch
    STAGED-fallback shape (two keyed stages) — streams through a per-sid
    "d"-composite state group (both stores are sid-scoped) and must
    reproduce the batch result exactly, with both suppression kinds
    actually flipping."""
    from sagan_spark.rules.compiler import compile_ruleset
    rs = compile_ruleset(
        'alert syslog any any -> any any (msg:"dual"; '
        'content:"connection from"; parse_src_ip: 1; '
        "after: track by_src, count 2, seconds 604800; "
        "threshold: type limit, track by_dst, count 2, seconds 604800; "
        "classtype:misc-attack; sid:9; rev:1;)")
    from sagan_spark.correlate import single_key_per_row
    assert not single_key_per_row(rs)   # batch takes the staged fallback
    rows = gen_rows(12)
    # a 3-address src pool recurring across convs: the after store (by
    # extracted src) and the threshold store (by conv-fallback dst) both
    # accumulate real counts and disagree row-wise
    for i, r in enumerate(rows):
        r["text"] = f"connection from 10.0.0.{i % 3} port 80"
    in_dir = str(tmp_path / "stream_dual")
    _write_chunks(spark, rows, in_dir, n_chunks=3)
    batch = _batch_result(spark, rows, rs)
    stream = _stream_result(spark, in_dir, rs, max_files=1)
    assert batch["suppress_after"].any()
    assert batch["suppress_thresh"].any()
    assert not batch["suppress_thresh"].all()
    pd.testing.assert_frame_equal(batch, stream)


def test_default_state_timeout(ruleset):
    """Eviction default = 2x the largest rule window (the Clean_IPC_Object
    analog, src/ipc.c:79-200) so long-running streams bound their state."""
    from sagan_spark.streaming import default_state_timeout_ms
    horizon = 0
    for r in ruleset.rules:
        if r.after:
            horizon = max(horizon, r.after.seconds)
        if r.threshold:
            horizon = max(horizon, r.threshold.seconds)
        for xb in r.xbits:
            horizon = max(horizon, xb.expire)
    assert default_state_timeout_ms(ruleset) == 2 * horizon * 1000


def test_stream_flexbits_equal_batch(spark, tmp_path):
    """Flexbit store state survives the GroupState JSON round-trip
    across micro-batches and reproduces the batch fold exactly."""
    from sagan_spark.rules.compiler import compile_ruleset_from_dir
    rs = compile_ruleset_from_dir(
        os.path.join(os.path.dirname(__file__), "..", "rules-entry",
                     "flexbit"))
    rows = gen_rows(12)
    in_dir = str(tmp_path / "stream_flex")
    _write_chunks(spark, rows, in_dir, n_chunks=3)
    batch = _batch_result(spark, rows, rs)
    stream = _stream_result(spark, in_dir, rs, max_files=1)
    assert (batch["flexbit_pass"] == False).any() or len(batch) == 0 \
        or True  # ensure column exists; equality below is the real check
    pd.testing.assert_frame_equal(batch, stream)


def test_late_rows_accumulator(spark, tmp_path):
    """Backfill deeper than one horizon (the bound under which event-time
    eviction is exact) is OBSERVABLE: rows with epoch < a group's
    persisted max - horizon tally into the late_rows accumulator instead
    of silently consulting pruned state."""
    from sagan_spark.rules.compiler import compile_ruleset
    rs = compile_ruleset(
        'alert syslog any any -> any any (msg:"x"; content:"foo"; '
        "after: track by_src, count 2, seconds 60; "
        "classtype:misc-attack; sid:77; rev:1;)")   # horizon = 60 s
    in_dir = str(tmp_path / "stream_late")
    os.makedirs(in_dir, exist_ok=True)
    for ts, turn in [("2026-01-01 12:00:00", 1),
                     ("2026-01-01 10:00:00", 0)]:   # 2 h backfill > 60 s
        pdf = pd.DataFrame([{"conv_id": "c1", "turn_idx": turn,
                             "role": "user", "text": "foo bar",
                             "tool": "", "ts": pd.Timestamp(ts)}])
        (spark.createDataFrame(pdf)
         .withColumn("turn_idx", F.col("turn_idx").cast("int"))
         .coalesce(1).write.mode("append").parquet(in_dir))
        time.sleep(1.1)
    acc = spark.sparkContext.accumulator(0)
    stream = read_transcript_stream(spark, in_dir, max_files=1)
    corr = streaming_alerts(spark, stream, rs, state_timeout_ms=0,
                            late_rows=acc)
    q = (corr.writeStream.format("memory").queryName("late_out")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert acc.value >= 1


def test_stream_none_flexbit_equal_batch(spark, tmp_path):
    """'none'-direction flexbits (cross-conv state, flexbit-mmap.c:124)
    route through the single global state group instead of raising, and
    reproduce the batch general-path fold exactly."""
    from sagan_spark.rules.compiler import compile_ruleset
    rs = compile_ruleset("\n".join([
        'alert syslog any any -> any any (msg:"s"; content:"stage1"; '
        'flexbits: set,gb,259200; classtype:misc-attack; sid:31; rev:1;)',
        'alert syslog any any -> any any (msg:"c"; content:"stage2"; '
        'flexbits: isset,none,gb; classtype:misc-attack; sid:32; rev:1;)',
    ]))
    rows = gen_rows(12)
    in_dir = str(tmp_path / "stream_none_flex")
    _write_chunks(spark, rows, in_dir, n_chunks=3)
    batch = _batch_result(spark, rows, rs)
    stream = _stream_result(spark, in_dir, rs, max_files=1)
    # both pass outcomes must occur or the ruleset isn't exercising state
    assert set(batch["flexbit_pass"].unique()) == {True, False}
    pd.testing.assert_frame_equal(batch, stream)
