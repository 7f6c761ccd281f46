"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/feature steps are STUBBED (image/audio libraries are not in
this container) behind ``_HAS_PIL``-style gates with a deterministic fake,
as the build brief requires — but the Spark-side plumbing is real and
tested: schema, partition-preserving ``mapInPandas``, Arrow batch shape,
and the UDF signatures a production pipeline would use.

Design notes for 100 TB:
* binary payloads stay in the executor (never .collect()); metadata-only
  projections (`media_metadata`) prune the binary column at the scan.
* decode fan-out uses mapInPandas so one input row can yield N frames
  without a shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "mime string, width int, height int, duration_ms int")

try:  # decode libs are absent in this sandbox — gate, don't fail
    from PIL import Image  # noqa: F401
    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def synth_media_df(spark, n: int = 64, real_images: bool = False) -> DataFrame:
    """Deterministic fake media table: payload bytes are a pure function
    of media_id (no RNG), so tests can assert exact feature values.

    ``real_images=True`` (requires PIL) emits valid PNG payloads — the
    corpus for exercising the REAL decode branch of extract_features."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if real_images:
            if not _HAS_PIL:
                raise RuntimeError("real_images=True needs PIL")
            import io

            from PIL import Image
            img = Image.new("L", (8, 8),
                            color=(i * 37) % 256)   # deterministic
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            payload, mime = buf.getvalue(), "image/png"
        else:
            payload = bytes(((i * 37 + j * 11) % 251)
                            for j in range(64 + i % 32))
            mime = f"application/x-fake-{kind}"
        rows.append((i, kind, payload, mime,
                     32 + i % 8, 24 + i % 6, 1000 + i * 10))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_metadata(df: DataFrame) -> DataFrame:
    """Metadata projection — column pruning drops the binary payload at
    the scan (verify via .explain: ReadSchema excludes `payload`)."""
    return df.select("media_id", "kind", "mime", "width", "height",
                     "duration_ms", F.length("payload").alias("n_bytes"))


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decode→embed step: byte-histogram
    moments.  Replace with PIL/torchvision/librosa when available."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return [0.0] * dim
    out = []
    for d in range(dim):
        out.append(round(float(np.mean((arr * (d + 1)) % 256) / 255.0), 6))
    return out


def _pil_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """REAL decode branch: PIL image → 16×16 grayscale → the same moment
    features as the fake (so both branches share shape and range).  Only
    importable when PIL is installed (_HAS_PIL)."""
    import io

    from PIL import Image
    img = Image.open(io.BytesIO(payload)).convert("L").resize((16, 16))
    arr = np.asarray(img, dtype=np.float64).ravel()
    return [round(float(np.mean((arr * (d + 1)) % 256) / 255.0), 6)
            for d in range(dim)]


def extract_features(df: DataFrame, dim: int = 8,
                     decoder: str = "auto") -> DataFrame:
    """payload → feature vector via Arrow-batched mapInPandas.

    ``decoder``: "pil" (real image decode, requires PIL and decodable
    payloads), "fake" (deterministic byte-histogram stand-in — the only
    branch runnable in a sandbox without decode libs), or "auto" (pil
    when available AND the frame's mime says image/*, else fake).  The
    Spark-side plumbing — schema, partitioning, UDF signature, Arrow
    batch shape — is identical in both branches and is what the pipeline
    tests pin down."""
    if decoder == "auto":
        decoder = "pil" if _HAS_PIL else "fake"
    if decoder == "pil" and not _HAS_PIL:
        raise RuntimeError("decoder='pil' needs PIL in the environment")

    schema = "media_id long, kind string, features array<double>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "pil":
                feats = []
                for p, m in zip(pdf["payload"].tolist(),
                                pdf["mime"].tolist()):
                    # non-image payloads keep the fake path even under
                    # pil (audio/video decoders are a separate gate)
                    feats.append(_pil_decode_features(p, dim)
                                 if m.startswith("image/")
                                 else _fake_decode_features(p, dim))
            else:
                feats = [_fake_decode_features(p, dim)
                         for p in pdf["payload"].tolist()]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"], "features": feats})

    return df.select("media_id", "kind", "mime", "payload").mapInPandas(
        fn, schema=schema)


def sample_frames(df: DataFrame, every_ms: int = 500,
                  max_frames_per_row: int = 100_000) -> DataFrame:
    """Video frame-sampling fan-out: one row per sampled frame timestamp —
    mapInPandas with 1→N expansion, no shuffle.  Frame decode is the same
    deterministic fake.

    ``max_frames_per_row`` bounds the per-row expansion (default 100k ≈
    a 14-hour video at 2 fps): a single corrupt/absurd duration value
    must degrade to a truncated sample, never an executor-OOM-ing
    multi-million-row fan-out (found the hard way when a 10× id fan-out
    pushed synthetic durations to ~10^8 ms)."""
    schema = "media_id long, frame_ms int, frame_feature double"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ms, fv = [], [], []
            for mid, dur, payload in zip(pdf["media_id"], pdf["duration_ms"],
                                         pdf["payload"]):
                dur = min(int(dur), every_ms * max_frames_per_row)
                for t in range(0, int(dur), every_ms):
                    ids.append(mid)
                    ms.append(t)
                    fv.append(round(
                        _fake_decode_features(payload, 1)[0] + t * 1e-6, 6))
            yield pd.DataFrame({"media_id": ids, "frame_ms": ms,
                                "frame_feature": fv})

    return (df.filter(F.col("kind") == "video")
            .select("media_id", "duration_ms", "payload")
            .mapInPandas(fn, schema=schema))
