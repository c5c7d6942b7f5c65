"""REST wrapper smoke tests (api_service.rs:163-183 demo parity): every
route drives the same shell/catalog/router calls over a local HTTP
client against an ephemeral-port stdlib server."""

import json
import urllib.request

import pytest

from dd_graphdb_spark.api import GraphApiServer
from dd_graphdb_spark.shell import GraphShell
from dd_graphdb_spark.views.catalog import RefreshPolicy, ViewCatalog, ViewDefinition


@pytest.fixture()
def server(spark, tmp_path):
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string") \
        .createOrReplaceTempView("vertices")
    cat = ViewCatalog(spark, str(tmp_path / "views"))
    cat.register(
        ViewDefinition(name="user_lookup", view_type="lookup",
                       refresh_policy=RefreshPolicy(kind="on_demand")),
        builder=lambda s: s.sql("SELECT id FROM vertices"),
    )
    srv = GraphApiServer(GraphShell(spark, cat)).start()
    yield srv
    srv.stop()


def _call(srv, method, path, body=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_view_crud_over_http(server):
    status, out = _call(server, "POST", "/views",
                        {"name": "v_names", "sql": "SELECT id, name FROM vertices"})
    assert status == 201, out
    status, out = _call(server, "GET", "/views")
    assert status == 200 and out["views"]["v_names"] == "sql"
    status, out = _call(server, "POST", "/views/v_names/refresh", {"force": True})
    assert status == 200, out
    status, out = _call(server, "GET", "/views/v_names?limit=10")
    assert status == 200
    assert sorted(r["name"] for r in out["rows"]) == ["a", "b"]
    status, out = _call(server, "DELETE", "/views/v_names")
    assert status == 200
    status, out = _call(server, "GET", "/views/v_names")
    assert status == 404


def test_query_routing_over_http(server):
    status, out = _call(server, "POST", "/query", {"kind": "vertex_lookup"})
    assert status == 200, out
    assert out["routed_to"] == "user_lookup" and out["score"] == 100
    assert sorted(r["id"] for r in out["rows"]) == [1, 2]
    status, out = _call(server, "POST", "/query", {"kind": "aggregation"})
    assert status == 404  # no aggregation view registered


def test_stats_cache_incremental_routes(server):
    status, out = _call(server, "GET", "/stats")
    assert status == 200 and out["stats"]["views"] == 1
    status, out = _call(server, "GET", "/cache/stats")
    assert status == 200 and "cache" in out
    status, out = _call(server, "POST", "/cache/warm")
    assert status == 200
    status, out = _call(server, "GET", "/incremental/stats")
    assert status == 200 and out["incremental"]["user_lookup"]["incremental"] is False
    status, out = _call(server, "POST", "/incremental/batch")
    assert status == 200


def test_errors_are_json(server):
    status, out = _call(server, "GET", "/nope")
    assert status == 404 and "error" in out
    status, out = _call(server, "POST", "/views", {"name": "x"})
    assert status == 400 and "error" in out


def test_gql_endpoint(spark, tmp_path):
    from dd_graphdb_spark.graph import PropertyGraph
    from dd_graphdb_spark.plans.lower import GQLEngine

    v = spark.createDataFrame(
        [(1, "Person", "Alice", 30), (2, "Person", "Bob", 25)],
        "id long, label string, name string, age long",
    )
    e = spark.createDataFrame([(1, 2, "friend")], "src long, dst long, label string")
    cat = ViewCatalog(spark, str(tmp_path / "views"))
    srv = GraphApiServer(
        GraphShell(spark, cat), gql_engine=GQLEngine(PropertyGraph(v, e))
    ).start()
    try:
        code, payload = _call(
            srv, "POST", "/gql",
            {"query": "MATCH (v:Person) WHERE v.age > 26 RETURN v.name"},
        )
        assert code == 200 and payload["rows"] == [{"v_name": "Alice"}]
        code, payload = _call(srv, "POST", "/gql", {"query": "MATCH ("})
        assert code == 400 and "error" in payload
    finally:
        srv.stop()


def test_gql_endpoint_absent_without_engine(server):
    code, payload = _call(server, "POST", "/gql", {"query": "MATCH (v) RETURN v"})
    assert code == 404 and "views-only" in payload["error"]


def test_gql_endpoint_mutations_gated(spark, tmp_path):
    from dd_graphdb_spark.graph import PropertyGraph
    from dd_graphdb_spark.plans.lower import GQLEngine

    v = spark.createDataFrame(
        [(1, "Person", "Alice")], "id long, label string, name string"
    )
    e = spark.createDataFrame([], "src long, dst long, label string")
    cat = ViewCatalog(spark, str(tmp_path / "views"))
    srv = GraphApiServer(
        GraphShell(spark, cat), gql_engine=GQLEngine(PropertyGraph(v, e))
    ).start()
    try:
        # default deployment: reads pass, every mutation statement is 403
        code, _ = _call(
            srv, "POST", "/gql", {"query": "MATCH (v:Person) RETURN v.name"}
        )
        assert code == 200
        for q in (
            "CREATE (n:Person {id: 99, name: 'Eve'})",
            "MATCH (v:Person) WHERE v.id = 1 DELETE v",
            "MATCH (v:Person) SET v.name = 'Mallory'",
            "MERGE (n:Person {id: 1, name: 'Alice'})",
        ):
            code, payload = _call(srv, "POST", "/gql", {"query": q})
            assert code == 403 and "mutations are disabled" in payload["error"], q
    finally:
        srv.stop()
