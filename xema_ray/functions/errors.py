"""Human-readable violation formatting — the analogue of the reference's
``Xema.ValidationError`` message assembly (lib/xema/validation_error.ex:
``travers_errors`` path-qualified messages, per-keyword formats at
validation_error.ex:121-411).

The engine's native error product is violation ROWS
``(doc_id, path, keyword, message)``; this module renders them for humans
and raises them as exceptions when callers want Xema's ``validate!``
behavior.
"""

from __future__ import annotations

from typing import Iterable, Optional


class ValidationError(ValueError):
    """Raised by :func:`validate_or_raise`; carries the violation list."""

    def __init__(self, violations: list):
        self.violations = list(violations)
        super().__init__(format_violations(self.violations))


def format_violation(v) -> str:
    """One line: ``<path>: <keyword> — <message>`` (supports both scalar
    Violation objects and violation-row dicts)."""
    if isinstance(v, dict):
        path, keyword, message = v.get("path", "/"), v.get("keyword", "?"), v.get("message", "")
        doc = v.get("doc_id")
    else:
        path, keyword, message = v.path or "/", v.keyword, v.message
        doc = None
    prefix = f"[{doc}] " if doc else ""
    return f"{prefix}{path}: {keyword} — {message}"


def format_violations(violations: Iterable, limit: Optional[int] = 25) -> str:
    vs = list(violations)
    lines = [format_violation(v) for v in (vs[:limit] if limit else vs)]
    if limit and len(vs) > limit:
        lines.append(f"... and {len(vs) - limit} more violation(s)")
    return "\n".join(lines) if lines else "valid"


def validate_or_raise(schema, value, fail: str = "early"):
    """``Xema.validate!``-style API: return the value or raise
    :class:`ValidationError` with formatted messages."""
    from xema_ray.functions.scalar import validate_value

    violations = validate_value(schema, value, fail=fail)
    if violations:
        raise ValidationError(violations)
    return value
