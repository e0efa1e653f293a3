"""Column <-> field name mapping (reference P4).

Mirrors Carpet's name-resolution stack: explicit alias takes
precedence, then exact match, then snake_case best-effort matching
(reference impl/read/ColumnToFieldMapper.java:46-85, strategies
FieldMatchingStrategy.java:18-22), plus the camelCase->snake_case
converter (impl/CaseConverter.java:24-68) used on the write side
(ColumnNamingStrategy.java:19-22).
"""

from __future__ import annotations

import re

_CAMEL_BOUNDARY = re.compile(
    r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])"
)


def camel_to_snake(name: str) -> str:
    """fooBarBaz -> foo_bar_baz; HTMLParser -> html_parser; keeps
    existing underscores and digits (reference CaseConverter semantics)."""
    return _CAMEL_BOUNDARY.sub("_", name).lower()


def snake_to_camel(name: str) -> str:
    parts = [p for p in name.split("_") if p]
    if not parts:
        return name
    return parts[0].lower() + "".join(p.capitalize() for p in parts[1:])


class FieldMatchingError(KeyError):
    pass


def map_fields(
    file_columns: list[str],
    requested_fields: list[str],
    aliases: dict[str, str] | None = None,
    strategy: str = "best_effort",
    fail_on_missing: bool = True,
) -> dict[str, str | None]:
    """Resolve each requested field to a file column.

    Precedence per field (reference ColumnToFieldMapper.mapFields):
      1. explicit alias (``aliases[field] -> column``, ≙ @Alias)
      2. exact name match
      3. snake_case match (strategy 'snake_case' or 'best_effort')
    Returns {field: column_or_None}; raises (or maps to None when
    ``fail_on_missing=False`` — reference SchemaValidation missing-
    column flag) when nothing matches.
    """
    aliases = aliases or {}
    cols = set(file_columns)
    snake_index: dict[str, str] = {}
    for c in file_columns:
        snake_index.setdefault(camel_to_snake(c), c)
    out: dict[str, str | None] = {}
    for f in requested_fields:
        if f in aliases:
            col = aliases[f]
            if col not in cols:
                raise FieldMatchingError(f"alias target {col!r} not in file")
            out[f] = col
            continue
        if f in cols:
            out[f] = f
            continue
        if strategy in ("snake_case", "best_effort"):
            cand = snake_index.get(camel_to_snake(f))
            if cand is not None:
                out[f] = cand
                continue
        if fail_on_missing:
            raise FieldMatchingError(f"no column matches field {f!r}")
        out[f] = None
    return out
