"""Side-by-side Spark vs DuckDB oracle parity for every registry query,
mimicking the driver's CORRECTNESS check (row count + columns +
order-insensitive normalized values) at sf0.001 for speed.
"""

import math
from datetime import date, datetime

import duckdb
import pytest

from conftest import SF_SMOKE

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return 0.0
        # 9 significant digits absorbs cross-engine summation order
        return float(f"{v:.9g}")
    if isinstance(v, (datetime, date)):
        return str(v)[:26]
    if hasattr(v, "item"):  # numpy scalars
        return _norm_cell(v.item())
    return v


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.fixture(scope="module")
def registry():
    from miniodb_spark.queries import get_registry

    return get_registry()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    return con


def _pairs():
    from miniodb_spark.queries import get_registry

    return [(n, s) for n, s in get_registry().items() if s.oracle is not None]


@pytest.mark.parametrize("name", [n for n, _ in _pairs()])
def test_query_matches_oracle(name, registry, duck, spark):
    spec = registry[name]
    sdf = spec.fn(spark, SF_SMOKE)
    # the external driver canonicalizes with pandas sort_values over
    # ALL columns, which raises on unhashable/unorderable cells —
    # array/map/struct outputs would be a driver-side crash even when
    # the values match (caught live by the round-11 sf0.01 soak:
    # array_set_ops_user_types). Oracle-backed entries must emit
    # scalar columns only; join arrays to strings at the output edge.
    from pyspark.sql import types as T

    complex_cols = [
        f.name for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{name}: complex-typed output columns {complex_cols} would "
        "crash the driver's pandas canonicalizer"
    )
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _canon(spark_rows, spark_cols)
    b = _canon(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_rows_only_queries_run(registry, spark):
    """Queries without an oracle still must run and return a stable schema."""
    for name, spec in registry.items():
        if spec.oracle is not None:
            continue
        df = spec.fn(spark, SF_SMOKE)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_asof_forward_same_ts_tie(spark, registry, tmp_path):
    """ADVICE r12 (medium): a click and a purchase at the SAME ts must
    match (the docstring's '<=' contract, and what DuckDB's
    ASOF 'c.ts <= p.ts' does). The shipped testdata has no exact-ts
    ties, so the inverted tie-break shipped green for a round — this
    synthetic fixture pins the tie case against the same oracle SQL."""
    import duckdb as _duckdb

    rows = [
        # user 1: purchase at the exact click ts (5.0) AND a later one
        # (7.0) — '<=' must pick the same-ts 5.0, not the later 7.0
        (1, "2024-01-01 10:00:00", 1, "click", None, "{}"),
        (None, "2024-01-01 10:00:00", 1, "purchase", 5.0, "{}"),
        (None, "2024-01-01 10:00:05", 1, "purchase", 7.0, "{}"),
        # user 2: only an EARLIER purchase — no match (NULL)
        (2, "2024-01-01 10:00:00", 2, "click", None, "{}"),
        (None, "2024-01-01 09:59:59", 2, "purchase", 4.0, "{}"),
        # user 3: two later purchases — nearest-forward (3.0) wins
        (3, "2024-01-01 10:00:00", 3, "click", None, "{}"),
        (None, "2024-01-01 10:00:01", 3, "purchase", 3.0, "{}"),
        (None, "2024-01-01 10:00:02", 3, "purchase", 9.0, "{}"),
    ]
    con = _duckdb.connect()
    con.execute(
        "CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO ev VALUES (?,?,?,?,?,?)", rows)
    fx = str(tmp_path / "events.parquet")
    con.execute(f"COPY ev TO '{fx}' (FORMAT PARQUET)")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{fx}')"
    )

    spec = registry["asof_join_forward"]
    sdf = spec.fn(spark, str(tmp_path))
    got = {r["event_id"]: r["next_purchase_value"] for r in sdf.collect()}
    assert got == {1: 5.0, 2: None, 3: 3.0}

    res = con.execute(spec.oracle)
    oracle = {r[0]: r[2] for r in res.fetchall()}
    assert got == oracle
