"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Input shape is exactly the BASELINE.json input_hint:
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)``.

Everything is a pure integer-arithmetic function of (conversation index,
turn index) — no wall clock, no RNG state — so the same rows can be
produced row-at-a-time (oracle tests), via pandas (Spark createDataFrame),
or fully distributed at bench scale (``spark.range`` → ``mapInPandas`` with
the same vectorized formulas; see :func:`transcripts_df`).

The text template bank seeds Sagan-matchable payloads exercising the cited
operators (FIXTURES.md §1: the parse-IP encoding zoo ip.c:32-61, the
meta_content users, after/threshold bursts, xbit stage pairs, ignore-list
fodder, offset/depth padded payloads).
"""

from __future__ import annotations

from datetime import datetime, timezone

BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z — fixed, never wall-clock

ROLES = ("user", "assistant", "tool", "system")
TOOLS = ("sshd", "web", "auth", "db", "none", "webapp", "kernel")

_MIX = 2654435761  # Knuth multiplicative-hash constant


def _h(i: int, t: int) -> int:
    """Deterministic per-turn hash."""
    return ((i * 1000003 + t * 7919 + 12345) * _MIX) & 0x7FFFFFFF


def make_text(i: int, t: int, noise_pct: int = 0) -> str:
    """Template bank — selection and parameters are pure functions of the
    hash so any executor can regenerate any row independently.

    ``noise_pct`` (0-100): percentage of turns that are non-matching
    routine chatter.  The default corpus (0) makes every turn hit ~1.4
    rules — right for correctness tests, absurd as a workload; bench runs
    use a realistic match density (e.g. 95% noise ≈ 5% rule-relevant,
    still far above real-world alert rates)."""
    h = _h(i, t)
    if noise_pct and (h >> 8) % 100 < noise_pct:
        return (f"routine operation completed status={h % 17} "
                f"latency={h % 900}ms worker={h % 64}")
    sel = h % 16
    o1, o2, o3 = 10 + h % 200, (h >> 3) % 256, (h >> 7) % 256
    port = 1024 + h % 50000
    user = ("mary", "frank", "alice", "bob", "guest")[h % 5]
    if sel == 0:
        return f"Invalid login from 12.{o2}.{o3}.{1 + h % 250}"
    if sel == 1:
        return f"connection from 192.168.{o2}.{1 + h % 250}:{port}"
    if sel == 2:
        return f"connection from {o1}.{o2}.{o3}.9 port {port}"
    if sel == 3:
        return f"packet forwarded {o1}.{o2}.{o3}.2 source port: {port} " \
               f"to 172.16.{o2}.{1 + h % 250} destination port 443"
    if sel == 4:
        return f"user {user} login failed"
    if sel == 5:
        return "File system full" if h % 2 else "No space left on device"
    if sel == 6:
        md5 = f"{h:08x}" * 4
        return f"file quarantined md5={md5}"
    if sel == 7:
        return f"tcp connection established with [fe80::b614:89ff:fe11:" \
               f"{h % 0x5e24:x}]:{port}"
    if sel == 8:
        return "DEBUG heartbeat ok"
    if sel == 9:
        # controlled byte offsets for offset/depth/distance/within windows
        return ("x" * 12 + "MARKER" + "y" * 6 + "tail-token") if h % 2 else \
               ("HEADpad " + "z" * (h % 6) + " TAILmore trailing text")
    if sel == 10:
        return f"sshd[{h % 9999}]: failed password for {user} " \
               f"from 10.{o2}.{o3}.4"
    if sel == 11:
        return "stage1 marker cmd=alpha" if t % 2 == 0 else \
               "stage2 marker cmd=beta"
    if sel == 12:
        return f"probe attempt seq={h % 7}"
    if sel == 13:
        return f"badge swipe door={h % 32}"
    if sel == 14:
        return f"connection from 203.0.113.{1 + h % 250}:{port} exploit attempt"
    return f"noisy chatter level={h % 9}" if h % 3 else \
        f"login failed for user {user} from 10.{o2}.{o3}.8:{port}"


def n_turns(i: int, hot_convs: int = 2, hot_len: int = 200,
            base_len: int = 8) -> int:
    """Zipf-ish skew: the first ``hot_convs`` conversations are hot
    (exercises the salting/AQE skew path, FIXTURES.md §1)."""
    if i < hot_convs:
        return hot_len
    return base_len + _h(i, 0) % 13


def turn_epoch(i: int, t: int) -> int:
    """20s cadence inside a conversation (bursts straddle the fixture
    after/threshold windows of 60/300 s), conversations offset from each
    other."""
    return BASE_EPOCH + (i % 997) * 53 + t * 20


def make_turn(i: int, t: int, noise_pct: int = 0) -> dict:
    return {
        "conv_id": f"conv-{i:08d}",
        "turn_idx": t,
        "role": ROLES[t % 4],
        "text": make_text(i, t, noise_pct),
        "tool": TOOLS[_h(i, t) % 7],
        "ts": datetime.fromtimestamp(turn_epoch(i, t), tz=timezone.utc),
    }


def gen_rows(n_convs: int, hot_convs: int = 2, hot_len: int = 200,
             base_len: int = 8) -> list[dict]:
    """Small-scale row list for oracle tests / createDataFrame."""
    rows = []
    for i in range(n_convs):
        for t in range(n_turns(i, hot_convs, hot_len, base_len)):
            rows.append(make_turn(i, t))
    return rows


# ---------------------------------------------------------------------------
# distributed generation (bench scale)
# ---------------------------------------------------------------------------

TRANSCRIPTS_SCHEMA = ("conv_id string, turn_idx int, role string, "
                      "text string, tool string, ts timestamp")


def transcripts_df(spark, n_convs: int, hot_convs: int = 2,
                   hot_len: int = 200, base_len: int = 8,
                   partitions: int | None = None, noise_pct: int = 0,
                   first_conv: int = 0):
    """Distributed transcripts generation: ``spark.range(n_convs)`` →
    ``mapInPandas`` expanding each conversation into its turns with the
    exact same arithmetic as :func:`gen_rows`.  Narrow (no shuffle); any
    row count is generated without driver-side materialization — the
    10^12-turn design-scale path is this same function at a larger range.
    """
    import pandas as pd

    def expand(batches):
        for pdf in batches:
            out = {k: [] for k in ("conv_id", "turn_idx", "role", "text",
                                   "tool", "ts")}
            for i in pdf["id"].tolist():
                for t in range(n_turns(i, hot_convs, hot_len, base_len)):
                    row = make_turn(i, t, noise_pct)
                    for k, v in row.items():
                        out[k].append(v)
            yield pd.DataFrame(out)

    rng = spark.range(first_conv, first_conv + n_convs)
    if partitions:
        rng = rng.repartition(partitions)
    return rng.mapInPandas(expand, schema=TRANSCRIPTS_SCHEMA)
