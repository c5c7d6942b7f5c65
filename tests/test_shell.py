"""GraphShell command dispatch (src/main.rs:118-220 surface parity —
except that VIEW CREATE/REFRESH actually work here instead of printing
'under development', main.rs:527-537)."""

import pytest

from dd_graphdb_spark.shell import GraphShell, REJECT_MSG
from dd_graphdb_spark.views.catalog import RefreshPolicy, ViewCatalog, ViewDefinition


@pytest.fixture()
def shell(spark, tmp_path):
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string") \
        .createOrReplaceTempView("vertices")
    cat = ViewCatalog(spark, str(tmp_path / "views"))
    return GraphShell(spark, cat)


def test_reject_regular_queries(shell):
    # the reference's philosophy gate (main.rs:5,167-175)
    for q in ("MATCH (v:Person) RETURN v", "CREATE (a:X)", "DELETE v"):
        r = shell.execute(q)
        assert not r.ok and r.message == REJECT_MSG


def test_help_and_unknown(shell):
    assert "VIEW CREATE" in shell.execute("help").message
    assert not shell.execute("frobnicate").ok
    assert shell.execute("quit").kind == "exit"


def test_view_lifecycle(shell):
    r = shell.execute("VIEW CREATE v_names AS SELECT id, name AS label FROM vertices")
    assert r.ok, r.message
    assert shell.execute("VIEW LIST").data == {"v_names": "sql"}
    assert shell.execute("VIEW REFRESH v_names FORCE").ok
    out = shell.execute("VIEW QUERY v_names")
    assert out.ok and sorted(t[1] for t in out.data.collect()) == ["a", "b"]
    assert shell.execute("VIEW DROP v_names").ok
    assert shell.execute("VIEW QUERY v_names").ok is False


def test_view_create_sql_with_inner_as(shell):
    # AS inside the SQL must not shift the name/sql split
    r = shell.execute("VIEW CREATE v2 AS SELECT name AS renamed FROM vertices")
    assert r.ok
    assert shell.execute("VIEW QUERY v2").data.columns == ["renamed"]


def test_routing_and_cache(shell):
    shell.catalog.register(
        ViewDefinition(name="user_lookup", view_type="lookup",
                       refresh_policy=RefreshPolicy(kind="on_demand")),
        builder=lambda s: s.sql("SELECT id FROM vertices"),
    )
    r = shell.execute("VIEW ROUTE vertex_lookup")
    # exact lookup pattern on a lookup view scores 100 (query_router.rs:192-260)
    assert r.ok and r.data["view"] == "user_lookup" and r.data["score"] == 100
    r = shell.execute("VIEW ROUTE aggregation")
    assert not r.ok  # no aggregation view registered
    r = shell.execute("VIEW ROUTE edge_traversal user_lookup")
    assert r.data["score"] == 100  # exact-target hint wins
    assert shell.execute("CACHE WARM").ok
    assert shell.execute("CACHE STATS").data["user_lookup"]["cached"] is True
    assert shell.execute("CACHE CLEAR").ok
    assert shell.execute("CACHE STATS").data["user_lookup"]["cached"] is False


def test_incremental_commands(shell):
    shell.execute("VIEW CREATE inc1 AS SELECT COUNT(*) AS n FROM vertices")
    st = shell.execute("INCREMENTAL STATS")
    assert st.data["inc1"]["dirty"] is True
    assert shell.execute("INCREMENTAL BATCH").data == ["inc1"]
    assert shell.execute("INCREMENTAL STATS").data["inc1"]["dirty"] is False
    assert shell.execute("INCREMENTAL FORCE inc1").ok
    assert not shell.execute("INCREMENTAL FORCE nope").ok
