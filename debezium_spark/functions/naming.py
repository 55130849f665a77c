"""Schema/field name adjustment (util/SchemaNameAdjuster.java,
schema/FieldNameSelector.java) — the ``sanitize.field.names`` /
Avro-naming config surface.

Two distinct rule sets in the reference:

* **Schema fullnames** (SchemaNameAdjuster.validFullname,
  SchemaNameAdjuster.java:149-190): first char must be ``[A-Za-z_]``, later
  chars add digits and ``.``; invalid chars are substituted (default ``_``)
  and a replacement that collides with a different original's replacement is
  a hard error (create()'s firstTimeOnly conflict handler throws).
* **Field names** (FieldNameSelector.FieldNameSanitizer.sanitizeColumnName):
  ``[A-Za-z0-9_]`` only (no dots), a leading digit is PREFIXED with ``_``
  (``1col`` -> ``_1col``, not ``_col``).

Schema names are driver-side metadata, so the adjusters are plain Python; the
column variant (for sanitizing a *data column* of collection/topic names, e.g.
ahead of topic routing) is codegen'd regexp algebra — no Python row path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "is_valid_fullname",
    "valid_fullname",
    "SchemaNameAdjuster",
    "sanitize_field_name",
    "sanitize_field_names",
    "sanitize_topic_col",
]

_FIRST = re.compile(r"[A-Za-z_]")
_REST = re.compile(r"[A-Za-z0-9_.]")


def is_valid_fullname(name: str) -> bool:
    """SchemaNameAdjuster.isValidFullname (SchemaNameAdjuster.java:117-131);
    the empty string is valid, per the reference."""
    if not name:
        return True
    if not _FIRST.fullmatch(name[0]):
        return False
    return all(_REST.fullmatch(c) for c in name[1:])


def valid_fullname(name: str, replacement: str = "_") -> str:
    """SchemaNameAdjuster.validFullname(proposedName, replacement)
    (SchemaNameAdjuster.java:149-190): substitute every invalid char."""
    if not name:
        return name
    out = [name[0] if _FIRST.fullmatch(name[0]) else replacement]
    out += [c if _REST.fullmatch(c) else replacement for c in name[1:]]
    return "".join(out)


class SchemaNameAdjuster:
    """The stateful AVRO adjuster (SchemaNameAdjuster.create,
    SchemaNameAdjuster.java:87-101): adjusts names and raises when two
    DIFFERENT originals collapse to the same replacement — a silent collision
    would alias two schemas in a registry."""

    def __init__(self, replacement: str = "_") -> None:
        self._replacement = replacement
        self._original_by_replacement: dict[str, str] = {}

    def adjust(self, proposed: str) -> str:
        result = valid_fullname(proposed, self._replacement)
        if result != proposed:
            prior = self._original_by_replacement.setdefault(result, proposed)
            if prior != proposed:
                raise ValueError(
                    f"schema name '{proposed}' adjusts to '{result}', which "
                    f"conflicts with another different schema '{prior}'"
                )
        return result


def sanitize_field_name(name: str) -> str:
    """FieldNameSanitizer.sanitizeColumnName (FieldNameSelector.java:44-76):
    non-``[A-Za-z0-9_]`` chars become ``_``; a leading digit is prefixed with
    ``_`` (the digit is kept)."""
    out = []
    for i, c in enumerate(name):
        if i == 0 and c.isdigit():
            out.append("_")
            out.append(c)
        elif c == "_" or c.isascii() and c.isalnum():
            out.append(c)
        else:
            out.append("_")
    return "".join(out)


def sanitize_field_names(df: DataFrame) -> DataFrame:
    """``sanitize.field.names=true``: rename every top-level column to its
    Avro-safe form (driver-side projection, zero row cost). Collisions raise —
    two source columns must not alias to one sink field."""
    renames = [(c, sanitize_field_name(c)) for c in df.columns]
    seen: dict[str, str] = {}
    for orig, newn in renames:
        prior = seen.setdefault(newn, orig)
        if prior != orig:
            raise ValueError(
                f"field '{orig}' sanitizes to '{newn}', colliding with '{prior}'"
            )
    if all(o == n for o, n in renames):
        return df
    return df.select(*[F.col(o).alias(n) for o, n in renames])


def sanitize_topic_col(col: Column, replacement: str = "_") -> Column:
    """Fullname adjustment over a DATA column of schema/topic names (the
    at-scale path when collection names travel with the rows, e.g. routing a
    multi-table stream): same rules as valid_fullname, pure regexp algebra."""
    fixed_rest = F.regexp_replace(col, r"[^A-Za-z0-9_.]", replacement)
    # first char: digits and '.' are invalid there
    return F.when(
        F.substring(col, 1, 1).rlike("^[A-Za-z_]$") | (F.length(col) == 0),
        fixed_rest,
    ).otherwise(
        F.concat(F.lit(replacement), F.substring(fixed_rest, 2, 2_147_483_647))
    )
