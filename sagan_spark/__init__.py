"""sagan_spark — a brand-new PySpark-native log rule-engine pipeline with
the query/data-processing capabilities of the reference log analysis engine
at /root/reference (Sagan 1.2.2 fork).  parse → enrich → route → aggregate
over a transcripts table (conv_id, turn_idx, role, text, tool, ts).

Not a port: execution is DataFrame/Catalyst + vectorized pandas UDFs; only
the *semantics* (SURVEY.md §2) are preserved.
"""

__version__ = "0.1.0"
