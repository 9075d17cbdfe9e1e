"""The operator-inventory query registry (SURVEY.md §2 coverage).

Each entry pairs a Spark implementation (DataFrame API — the logical
plan is declared, Catalyst picks the physical strategy) with an
ANSI-SQL oracle that DuckDB runs over the same parquet tables. The
driver executes both at sf0.01 and hash-compares results, so:

- every computed column is aliased identically on both sides;
- integer aggregates are cast to BIGINT in the oracle (DuckDB SUMs
  integers into HUGEINT, Spark into long);
- every ORDER BY used under a LIMIT is a *total* order (unique
  tie-break key) so both engines pick the same rows;
- floating outputs that accumulate differently across engines are
  rounded where needed.

The reference delegates this whole surface to DuckDB
(/root/reference/docs/SOLUTION.md:1282-1290); our engine delegates it
to Catalyst. The registry is the parity proof.
"""

from __future__ import annotations

from .base import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    load,
    normalize_event_ts,
    register,
)

# Importing the query modules executes their @register calls. Import
# order == the historical single-file registration order; the final
# get_registry() order is pinned by _PRIORITY_ORDER (which names every
# entry), with registration order as the fallback for entries added
# between rotations. tests/test_registry_order.py pins the result.
from . import core  # noqa: E402,F401
from . import coverage  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import statistics  # noqa: E402,F401
from . import surface  # noqa: E402,F401
from . import enginepath  # noqa: E402,F401
from .order import _PRIORITY_ORDER  # noqa: E402


def get_registry() -> dict[str, QuerySpec]:
    # import extension registries lazily to avoid cycles
    from ..operators import register_all as _register_ops
    from ..sketches import register_queries as _register_sketches

    _register_ops(register)
    _register_sketches(register)
    missing = [n for n in _PRIORITY_ORDER if n not in REGISTRY]
    assert not missing, f"_PRIORITY_ORDER names not in REGISTRY: {missing}"
    ordered = {n: REGISTRY[n] for n in _PRIORITY_ORDER}
    ordered.update({n: s for n, s in REGISTRY.items() if n not in ordered})
    return ordered
