"""Schema reconciliation before merge (north rule: added/widened cols).

Generalizes the reference's _safe_read_csv, which synthesizes missing
columns with typed defaults before merging intermediates
(reference scripts/merge_support.py:17-36).

Rules:
- column in table only  -> kept, batch rows get NULL
- column in batch only  -> appended to the table schema (addition)
- both, same type       -> unchanged
- both, widenable       -> widened (int->long, float->double, ...)
- both, incompatible    -> SchemaEvolutionError (never silent corruption)
"""

from __future__ import annotations

from pyspark.sql import types as T

_WIDEN_ORDER = {
    "byte": 0,
    "short": 1,
    "integer": 2,
    "long": 3,
    "float": 10,
    "double": 11,
    "decimal": 20,
}
_NUMERIC_FAMILIES = ({"byte", "short", "integer", "long"}, {"float", "double"})


class SchemaEvolutionError(ValueError):
    pass


def _widen(a: T.DataType, b: T.DataType, name: str) -> T.DataType:
    if a == b:
        return a
    an, bn = a.typeName(), b.typeName()
    for family in _NUMERIC_FAMILIES:
        if an in family and bn in family:
            return a if _WIDEN_ORDER[an] >= _WIDEN_ORDER[bn] else b
    # int family -> float family promotion (e.g. long -> double)
    ints, floats = _NUMERIC_FAMILIES
    if an in ints and bn in floats:
        return b
    if bn in ints and an in floats:
        return a
    raise SchemaEvolutionError(f"column {name!r}: cannot reconcile {an} with {bn}")


def reconcile(table_schema: T.StructType, batch_schema: T.StructType) -> tuple[T.StructType, bool]:
    """Return (target schema, changed?). Table column order is kept;
    brand-new batch columns are appended in batch order."""
    table_fields = {f.name: f for f in table_schema.fields}
    out: list[T.StructField] = []
    changed = False
    batch_fields = {f.name: f for f in batch_schema.fields}
    for f in table_schema.fields:
        if f.name in batch_fields:
            dt = _widen(f.dataType, batch_fields[f.name].dataType, f.name)
            if dt != f.dataType:
                changed = True
            out.append(T.StructField(f.name, dt, nullable=True))
        else:
            out.append(T.StructField(f.name, f.dataType, nullable=True))
    for f in batch_schema.fields:
        if f.name not in table_fields:
            out.append(T.StructField(f.name, f.dataType, nullable=True))
            changed = True
    return T.StructType(out), changed
