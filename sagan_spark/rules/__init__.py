from .compiler import RuleSet, compile_ruleset, compile_ruleset_from_dir  # noqa: F401
from .model import CompiledRule  # noqa: F401
