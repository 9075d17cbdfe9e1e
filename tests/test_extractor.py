from miniodb_spark.extractor import analyze_complexity, classify_query, extract_tables


def test_extract_simple():
    assert extract_tables("SELECT * FROM users") == ["users"]
    assert extract_tables("select a from Users where x=1") == ["users"]


def test_extract_joins():
    sql = (
        "SELECT u.name FROM users u INNER JOIN orders o ON u.id=o.user_id "
        "LEFT JOIN nation n ON 1=1 CROSS JOIN region"
    )
    assert extract_tables(sql) == ["users", "orders", "nation", "region"]


def test_extract_subquery():
    sql = "SELECT * FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer)"
    assert set(extract_tables(sql)) == {"orders", "customer"}


def test_cte_names_excluded():
    sql = "WITH top AS (SELECT * FROM orders) SELECT * FROM top JOIN customer ON 1=1"
    assert extract_tables(sql) == ["orders", "customer"]


def test_quoted_and_qualified():
    # Under the pinned dialect (session.py: doubleQuotedIdentifiers=
    # false) "MyTable" after FROM is a STRING LITERAL — Spark rejects
    # the statement with PARSE_SYNTAX_ERROR (probed) — so the
    # extractor must see no table there (r17; previously this
    # asserted the pre-dialect-fix behavior ["mytable"]).
    assert extract_tables('SELECT * FROM "MyTable"') == []
    assert extract_tables("SELECT * FROM db.schema_tbl") == ["schema_tbl"]


def test_classify():
    assert classify_query("SELECT * FROM t") == "select"
    assert classify_query("SELECT count(*) FROM t") == "count"
    assert classify_query("SELECT sum(x) FROM t") == "aggregation"
    assert classify_query("SELECT a, sum(x) FROM t GROUP BY a") == "group_by"
    assert classify_query("SELECT * FROM a JOIN b ON 1=1") == "join"
    assert classify_query("WITH x AS (SELECT 1) SELECT * FROM x") == "cte"
    assert classify_query("SELECT row_number() OVER (ORDER BY x) FROM t") == "window"


def test_complexity_and_cacheability():
    simple = analyze_complexity("SELECT * FROM t")
    assert simple.level == "simple" and not simple.cacheable
    medium = analyze_complexity("SELECT a, sum(x) FROM t GROUP BY a ORDER BY a")
    assert medium.level in ("medium", "complex") and medium.cacheable


def test_extract_tables_comma_lists():
    """Round-15 fix: comma-separated FROM lists (TPC-H's implicit-join
    phrasing) must register every member, with and without aliases,
    while IN-list commas and CTE names stay excluded."""
    assert extract_tables("SELECT * FROM a, b WHERE a.k = b.k") == \
        ["a", "b"]
    assert extract_tables(
        "SELECT * FROM customer c, orders o, lineitem l "
        "WHERE c.c_custkey = o.o_custkey") == \
        ["customer", "orders", "lineitem"]
    assert extract_tables("SELECT * FROM a x, b AS y, c") == \
        ["a", "b", "c"]
    assert extract_tables(
        "SELECT * FROM a WHERE k IN (1, 2) AND v = 3") == ["a"]
    assert extract_tables(
        "WITH w AS (SELECT 1 AS k) SELECT * FROM a, w") == ["a"]
    assert extract_tables(
        "SELECT * FROM a, b JOIN c ON b.k = c.k") == ["a", "b", "c"]


def test_literal_content_neither_fabricates_nor_hides_tables():
    """r16: scans run on literal-blanked text. A string literal
    containing `FROM ghost` must not fabricate a table reference (the
    engine fails the whole query with "table not found" for one), a
    literal containing `--` must not let the comment stripper truncate
    the rest of its line (losing the real FROM), and keyword soup in
    literals must not skew classification or complexity."""
    assert extract_tables(
        "SELECT 'data FROM ghost' AS note, id FROM users") == ["users"]
    assert extract_tables("SELECT 'a -- b' AS x FROM users") == ["users"]
    assert extract_tables(
        "SELECT 'x /* y */ z' AS x, id FROM users") == ["users"]
    assert extract_tables(
        "SELECT * FROM t WHERE note = 'JOIN the club'") == ["t"]
    assert classify_query("SELECT 'x UNION y' FROM t") == "select"
    assert classify_query("SELECT 'a JOIN b' FROM t") == "select"
    assert analyze_complexity(
        "SELECT 'join join (select' FROM t").score == 0
    # escaped quotes stay atomic
    assert extract_tables(
        "SELECT 'it''s FROM nowhere' FROM users") == ["users"]
