"""Error taxonomy for the rule-expression evaluator.

Mirrors the reference's error contract
(/root/reference/fs_schema_validator/evaluator/errors.py:1-6): an unbound
`$binding` raises ``UnboundSymbolError``; coercing a multi-variant enum or a
range to a scalar string raises ``CoercionError``. Both are ``ValueError``
subclasses so callers may catch broadly.
"""

from __future__ import annotations


class EvaluatorError(ValueError):
    """Base class for all evaluator errors."""


class ParseError(EvaluatorError):
    """Raised when a template / expression / assignment cannot be parsed."""


class UnboundSymbolError(EvaluatorError):
    """Raised when a ``$binding`` has no value in the binding environment."""


class CoercionError(EvaluatorError):
    """Raised when a value cannot be coerced to a scalar string."""
