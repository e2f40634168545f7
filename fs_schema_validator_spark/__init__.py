"""fs_schema_validator_spark — a PySpark-native schema + constraint
validation engine for web-scale tokenized-sequence tables.

A from-scratch re-expression of the semantics of
``nablaflow/fs-schema-validator`` (reference at /root/reference, studied for
behavior only): declare rules in YAML, compile them through binding
expansion and ``if:`` gating into Spark SQL predicates and vectorized Arrow
kernels, evaluate in one distributed pass, and emit a deterministic,
structured violations report with per-partition verdicts.
"""

from .engine import RuleSet, RuleSetError, ValidationEngine, ValidationResult
from .session import get_spark

__all__ = [
    "RuleSet",
    "RuleSetError",
    "ValidationEngine",
    "ValidationResult",
    "get_spark",
]

__version__ = "0.1.0"
