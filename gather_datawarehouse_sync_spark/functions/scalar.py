"""Path/string scalar helpers (F1-F9, SURVEY §2.9).

Each mirrors an inline JS expression in the reference; all are thin
wrappers over built-in ``pyspark.sql.functions`` so they stay inside
whole-stage codegen (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def basename(path: Column) -> Column:
    """Last path component (F3; ``split('/').pop()``,
    ``src/DataWarehouse.js:132``, ``:331``, ``:364``)."""
    return F.element_at(F.split(path, "/"), -1)


def strip_extension(name: Column) -> Column:
    """Drop the final ``.ext`` (F4; ``src/DataWarehouse.js:364``)."""
    return F.regexp_replace(name, r"\.[^.]*$", "")


def strip_prefix(path: Column, prefix: str) -> Column:
    """Remove a configured root prefix (F5; ``src/DataWarehouse.js:38``)."""
    import re

    return F.regexp_replace(path, "^" + re.escape(prefix), "")


def has_suffix(path: Column, suffix: str = ".shp") -> Column:
    """Case-insensitive suffix predicate (F2/S2;
    ``src/DataWarehouse.js:34``)."""
    return F.lower(path).endswith(suffix.lower())


def derived_title(path: Column) -> Column:
    """Project title = basename without extension
    (``src/DataWarehouse.js:364``)."""
    return strip_extension(basename(path))


def lit_map(
    d: dict, key_type: str = "string", value_type: str = "long"
) -> Column:
    """A literal MAP expression from a Python dict — the shared
    constructor for inline lookup tables (classifier weights, interleave
    weights, small vocabulary indexes).  Keys/values become ``lit``
    columns in insertion order.

    SIZE CAUTION: Catalyst's GetMapValue on a literal map is a LINEAR
    key scan per lookup, not a hash probe — fine for a few dozen
    entries, pathological when the map approaches thousands of keys on
    a hot column (measured: ~40 s of pure key scanning at 931 entries ×
    a few million lookups; see jaccard_pairs_bitset, which switches to
    a broadcast hash join past 64 entries).

    An empty dict yields an empty map of ``map<key_type, value_type>``
    (the explicit types matter: an untyped empty array would make the
    map ``map<void, void>`` and any lookup would fail ANALYSIS with a
    type mismatch rather than returning NULL — so lookups on an empty
    lit_map coalesce to their defaults like any other missing key).
    """
    from itertools import chain

    if not d:
        return F.map_from_arrays(
            F.array().cast(f"array<{key_type}>"),
            F.array().cast(f"array<{value_type}>"),
        )
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(d.items())])
