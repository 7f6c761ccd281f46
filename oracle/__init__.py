from .engine import OracleEngine, Event  # noqa: F401
