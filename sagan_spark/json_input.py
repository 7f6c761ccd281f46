"""S3/S4 — JSON input parsing and embedded-JSON re-extraction.

Re-implements, Spark-first, the semantics of:

* JSON input mode — /root/reference/src/input-json.c:45-160 (the
  non-nested "easy way" path): a ``json-input.map`` line maps JSON keys
  to the 9 syslog fields; absent fields default to ``"UNDEFINED"``
  (input-json.c:65-73) and the mapped message gains a LEADING SPACE
  (the ``snprintf(.., " %s", ..)`` quirk, input-json.c:147 — preserved
  bug-compatibly); unparseable JSON increments ``malformed_json_input``
  (input-json.c:96-98).
* map loader — src/input-json-map.c:80-160: JSON-lines file, one object
  per software, keys ``syslog-source-ip facility level priority tags
  time date program message`` naming the JSON field to read.
* embedded-JSON detector — src/processors/engine.c:239-291: when the
  program begins with ``{`` at offset 0/1, or the message carries ``{``
  at offset 1/2 (offset 0 is the leading-space quirk), the payload is
  re-parsed through ``message-json-map`` entries; among multiple map
  entries the highest match-count score wins, first on ties
  (src/message-json-map.c Parse_JSON_Message scoring).

Everything is JVM-side (``get_json_object`` / ``from_json`` — no Python
UDF), so the stage stays inside whole-stage codegen and the JSON parse
is Jackson, not per-row Python.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F

# target field → json-input.map key (input-json-map.c:108-150)
JSON_INPUT_MAP_KEYS = {
    "host": "syslog-source-ip",
    "facility": "facility",
    "level": "level",
    "priority": "priority",
    "tag": "tags",
    "time": "time",
    "date": "date",
    "program": "program",
    "message": "message",
}

UNDEFINED = "UNDEFINED"   # input-json.c:65-73 field default

# fields an embedded-JSON message map may extract
# (struct _JSON_Message_Map, src/message-json-map.c:95-200)
MESSAGE_MAP_FIELDS = ("message", "program", "src_ip", "dst_ip",
                      "src_port", "dst_port", "proto", "md5", "sha1",
                      "sha256", "filename", "hostname", "url", "username")


def load_json_input_map(text: str, software: str = "") -> dict[str, str]:
    """json-input.map loader (input-json-map.c:80-160): JSON-lines; pick
    the entry whose ``software`` matches (or the first entry when no
    software given).  Returns {target_field: json_key}."""
    for line in text.splitlines():
        line = line.strip()
        if not line or line[0] in "#;":
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if software and obj.get("software") != software:
            continue
        out = {}
        for field, key in JSON_INPUT_MAP_KEYS.items():
            if key in obj:
                out[field] = obj[key]
        if "host" not in out:
            # sanity check (input-json-map.c:155-159)
            raise ValueError(
                f"json-input.map entry missing 'syslog-source-ip': {line!r}")
        return out
    raise ValueError(f"no json-input.map entry for software {software!r}")


def load_message_json_maps(text: str) -> list[dict[str, str]]:
    """message-json-map loader (src/message-json-map.c:60-220): every
    JSON line is one candidate map {target_field: json_key}."""
    maps = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line[0] in "#;":
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        m = {f: obj[f] for f in MESSAGE_MAP_FIELDS if f in obj}
        if m:
            maps.append(m)
    return maps


def parse_json_input(df: DataFrame, mapping: dict[str, str],
                     text_col: str = "text") -> DataFrame:
    """One JSON log line per row → the 9 syslog fields
    (SyslogInput_JSON, input-json.c:45-160).

    Adds columns ``host facility level priority tag time date program
    message`` (absent → UNDEFINED; message gains the leading space) and
    ``malformed_json`` (1 when the line isn't valid JSON — the
    malformed_json_input counter, input-json.c:96-98)."""
    parsed_ok = F.from_json(F.col(text_col), "map<string,string>")
    out = df.withColumn(
        "malformed_json",
        F.when(parsed_ok.isNull(), F.lit(1)).otherwise(F.lit(0)))
    for field in JSON_INPUT_MAP_KEYS:
        key = mapping.get(field)
        if key is None:
            col = F.lit(UNDEFINED)
        else:
            raw = F.when(F.col("malformed_json") == 0,
                         F.get_json_object(F.col(text_col), f"$.{key}"))
            col = F.coalesce(raw, F.lit(UNDEFINED))
            if field == "message":
                # leading-space quirk (input-json.c:147 snprintf " %s"):
                # gated on key PRESENCE, not on the value — a message
                # field literally equal to "UNDEFINED" still gets the
                # space the reference's snprintf always prepends
                col = F.when(raw.isNull(), F.lit(UNDEFINED)).otherwise(
                    F.concat(F.lit(" "), raw))
        out = out.withColumn(field, col)
    return out


def embedded_json_detector(message_col, program_col):
    """The detector predicate (engine.c:249-250 for program offset 0/1;
    engine.c:278-280 for message offset 1/2 — offset 0 is skipped
    because real messages carry the leading-space quirk)."""
    prog = F.coalesce(program_col, F.lit(""))
    msg = F.coalesce(message_col, F.lit(""))
    return ((F.substring(prog, 1, 1) == "{") |
            (F.substring(prog, 2, 1) == "{") |
            (F.substring(msg, 2, 1) == "{") |
            (F.substring(msg, 3, 1) == "{"))


def extract_embedded_json(df: DataFrame,
                          maps: list[dict[str, str]],
                          message_col: str = "message",
                          program_col: str = "program") -> DataFrame:
    """Embedded-JSON re-extraction (Parse_JSON_Message,
    src/message-json-map.c:300-540): rows where the detector fires are
    parsed against every candidate map; the map with the highest
    present-key score wins (first wins ties, scoring loop mjm.c:360-470);
    extracted fields land in columns named after MESSAGE_MAP_FIELDS
    (empty string when absent / not JSON).

    Emits every input row — non-JSON rows pass through with empty
    extraction columns, exactly like the reference (a failed tokener
    parse just returns, mjm.c:317-330)."""
    msg = F.coalesce(F.col(message_col), F.lit(""))
    prog = F.coalesce(F.col(program_col), F.lit(""))
    # program-mode merge (engine.c:259-267): program + message
    merged = F.when(
        (F.substring(prog, 1, 1) == "{") | (F.substring(prog, 2, 1) == "{"),
        F.concat(prog, msg)).otherwise(msg)
    # parse from the first '{'
    payload = F.substring(merged, F.instr(merged, "{"), F.length(merged))
    is_json = embedded_json_detector(msg, prog) & \
        F.from_json(payload, "map<string,string>").isNotNull()

    out = df.withColumn("_ej_payload", payload) \
            .withColumn("_ej_is_json", is_json)

    # per-map score = number of mapped keys present (mjm.c:360-470)
    scores = []
    for mi, m in enumerate(maps):
        score = None
        for field, key in m.items():
            present = F.when(
                F.get_json_object(F.col("_ej_payload"),
                                  f"$.{key}").isNotNull(), 1).otherwise(0)
            score = present if score is None else score + present
        out = out.withColumn(f"_ej_score_{mi}", F.when(
            F.col("_ej_is_json"), score).otherwise(F.lit(0)))
        scores.append(F.col(f"_ej_score_{mi}"))
    # winning map index: first index achieving the max positive score
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    win = F.lit(-1)
    for mi in range(len(maps) - 1, -1, -1):
        win = F.when((scores[mi] == best) & (best > 0),
                     F.lit(mi)).otherwise(win)
    out = out.withColumn("_ej_win", win)

    for field in MESSAGE_MAP_FIELDS:
        col = F.lit("")
        for mi, m in enumerate(maps):
            if field in m:
                col = F.when(
                    F.col("_ej_win") == mi,
                    F.coalesce(F.get_json_object(
                        F.col("_ej_payload"), f"$.{m[field]}"),
                        F.lit(""))).otherwise(col)
        out = out.withColumn(f"json_{field}", col)
    return out.drop("_ej_payload", "_ej_is_json", "_ej_win",
                    *[f"_ej_score_{mi}" for mi in range(len(maps))])
