"""Interactive command surface — the reference's flagship UX.

The reference shell (src/main.rs:118-220) rejects raw MATCH/CREATE/DELETE
("NO REGULAR QUERY SUPPORT - All access through materialized views",
src/main.rs:5,167-175) and exposes VIEW / CACHE / INCREMENTAL commands.
Several of those print "under development" (VIEW CREATE/REFRESH,
main.rs:527-537); here every command performs the real operation against
the ViewCatalog / QueryRouter / GraphStore.

Command set (help text parity with main.rs:183-220):

    help | stats | views | quit | exit
    VIEW LIST
    VIEW CREATE <name> AS <sql>
    VIEW REFRESH <name>          (FORCE to override the refresh policy)
    VIEW QUERY <name>            -> DataFrame
    VIEW DROP <name>
    VIEW ROUTE <kind> [target]   (vertex_lookup|aggregation|analytics|edge_traversal)
    CACHE STATS | CACHE CLEAR | CACHE WARM
    INCREMENTAL STATS | INCREMENTAL FORCE <name> | INCREMENTAL BATCH

Execution is parse-and-dispatch only: the heavy lifting is the catalog's
parquet-backed materialized views, so a shell command never introduces
driver-side computation beyond the command's own metadata.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from dd_graphdb_spark.views.catalog import RefreshPolicy, ViewCatalog, ViewDefinition
from dd_graphdb_spark.views.router import QueryPattern, QueryRouter

REJECT_MSG = (
    "Regular queries are not supported! Use 'VIEW' commands to access "
    "materialized views instead. Type 'help' to see available view operations."
)

HELP = """Graph Engine - Materialized Views Edition
NO REGULAR QUERY SUPPORT - All access through materialized views

Available Commands:
  help                      - Show this help message
  stats                     - Show database statistics
  views / VIEW LIST         - List all registered views
  VIEW CREATE <name> AS <sql> - Create a SQL materialized view
  VIEW REFRESH <name> [FORCE] - Refresh a specific view
  VIEW QUERY <name>         - Read a view's materialized data
  VIEW DROP <name>          - Drop a view
  VIEW ROUTE <kind> [target] - Route a query pattern to the best view
  CACHE STATS               - Show view cache statistics
  CACHE CLEAR               - Unpin all cached views
  CACHE WARM                - Pin every registered view in memory
  INCREMENTAL STATS         - Show incremental maintenance state
  INCREMENTAL FORCE <name>  - Force update of a specific view
  INCREMENTAL BATCH         - Refresh all pending views in topo order
  quit/exit                 - Exit"""


@dataclass
class ShellResult:
    ok: bool
    kind: str  # help | stats | views | route | cache | incremental | data | error | exit
    message: str = ""
    data: Any = None  # DataFrame for VIEW QUERY, dict for stats-style output
    extra: dict = field(default_factory=dict)


class GraphShell:
    """Stateless command dispatcher over a catalog (+ optional store)."""

    def __init__(self, spark: SparkSession, catalog: ViewCatalog, store=None):
        self.spark = spark
        self.catalog = catalog
        self.router = QueryRouter(catalog)
        self.store = store

    # ------------------------------------------------------------------
    def execute(self, line: str) -> ShellResult:
        line = line.strip()
        if not line:
            return ShellResult(True, "help", "")
        low = line.lower()
        if low in ("quit", "exit"):
            return ShellResult(True, "exit", "bye")
        if low == "help":
            return ShellResult(True, "help", HELP)
        if low == "stats":
            return self._stats()
        if low == "views":
            return self._view_list()
        head = line.split()[0].upper()
        if head == "VIEW":
            return self._view(line)
        if head == "CACHE":
            return self._cache(line)
        if head == "INCREMENTAL":
            return self._incremental(line)
        # the reference's philosophy gate (main.rs:167-175)
        if head in ("MATCH", "CREATE", "DELETE"):
            return ShellResult(False, "error", REJECT_MSG)
        return ShellResult(False, "error", f"Unknown command: {line}. Type 'help' for assistance.")

    # ------------------------------------------------------------------
    def _stats(self) -> ShellResult:
        if self.store is None:
            return ShellResult(
                True, "stats", "no store attached", data={"views": len(self.catalog.defs)}
            )
        s = self.store.stats()
        s["views"] = len(self.catalog.defs)
        return ShellResult(True, "stats", str(s), data=s)

    def _view_list(self) -> ShellResult:
        names = self.catalog.list_views()
        data = {n: self.catalog.defs[n].view_type for n in names}
        return ShellResult(True, "views", ", ".join(names) or "(no views)", data=data)

    def _view(self, line: str) -> ShellResult:
        parts = line.split()
        if len(parts) < 2:
            return ShellResult(False, "error", "Usage: VIEW <LIST|CREATE|REFRESH|QUERY|DROP|ROUTE> ...")
        op = parts[1].upper()
        if op == "LIST":
            return self._view_list()
        if op == "CREATE":
            # VIEW CREATE <name> AS <sql...> — token 3 must be the AS
            # keyword so an AS inside the SQL can't shift the split
            toks = line.split(None, 4)
            if len(toks) < 5 or toks[3].upper() != "AS":
                return ShellResult(False, "error", "Usage: VIEW CREATE <name> AS <sql>")
            name, sql = toks[2], toks[4].strip()
            try:
                self.catalog.register(
                    ViewDefinition(name=name, view_type="sql", sql=sql,
                                   refresh_policy=RefreshPolicy(kind="on_demand"))
                )
            except ValueError as e:
                return ShellResult(False, "error", str(e))
            return ShellResult(True, "views", f"created view {name}")
        if op in ("REFRESH", "QUERY", "DROP") and len(parts) < 3:
            return ShellResult(False, "error", f"Usage: VIEW {op} <view_name>")
        if op == "REFRESH":
            name = parts[2]
            if name not in self.catalog.defs:
                return ShellResult(False, "error", f"unknown view {name}")
            force = len(parts) > 3 and parts[3].upper() == "FORCE"
            try:
                ran = self.catalog.refresh(name, force=force)
            except Exception as ex:  # bad SQL / lost builder: keep the shell alive
                return ShellResult(False, "error", f"refresh {name} failed: {ex}")
            return ShellResult(True, "views", f"refreshed {name}" if ran else f"{name} fresh (policy)")
        if op == "QUERY":
            name = parts[2]
            if name not in self.catalog.defs:
                return ShellResult(False, "error", f"unknown view {name}")
            try:
                return ShellResult(True, "data", f"view {name}", data=self.catalog.read(name))
            except Exception as ex:
                return ShellResult(False, "error", f"read {name} failed: {ex}")
        if op == "DROP":
            if parts[2] not in self.catalog.defs:
                return ShellResult(False, "error", f"unknown view {parts[2]}")
            self.catalog.drop(parts[2])
            return ShellResult(True, "views", f"dropped {parts[2]}")
        if op == "ROUTE":
            if len(parts) < 3:
                return ShellResult(False, "error", "Usage: VIEW ROUTE <kind> [target]")
            pattern = QueryPattern(kind=parts[2], target=parts[3] if len(parts) > 3 else None)
            decision = self.router.route(pattern)
            if decision is None:
                return ShellResult(False, "route", f"no view matches pattern {parts[2]}")
            return ShellResult(
                True, "route", f"{decision.view} (score {decision.score})",
                data=vars(decision),
            )
        return ShellResult(False, "error", f"Unknown view operation: {op}")

    def _cache(self, line: str) -> ShellResult:
        parts = line.split()
        op = parts[1].upper() if len(parts) > 1 else ""
        if op == "STATS":
            return ShellResult(True, "cache", "cache stats", data=self.catalog.stats())
        if op == "CLEAR":
            for n in self.catalog.list_views():
                self.catalog.state[n]["cached"] = False
            self.spark.catalog.clearCache()
            return ShellResult(True, "cache", "cache cleared")
        if op == "WARM":
            for n in self.catalog.list_views():
                self.catalog.cache_view(n)
            return ShellResult(True, "cache", f"pinned {len(self.catalog.defs)} views")
        return ShellResult(False, "error", "Usage: CACHE <STATS|CLEAR|WARM>")

    def _incremental(self, line: str) -> ShellResult:
        parts = line.split()
        op = parts[1].upper() if len(parts) > 1 else ""
        if op == "STATS":
            data = {
                n: {
                    "incremental": n in self.catalog.incremental,
                    "dirty": self.catalog.state[n]["dirty"],
                }
                for n in self.catalog.list_views()
            }
            return ShellResult(True, "incremental", "incremental stats", data=data)
        if op == "FORCE":
            if len(parts) < 3:
                return ShellResult(False, "error", "Usage: INCREMENTAL FORCE <view_name>")
            name = parts[2]
            if name not in self.catalog.defs:
                return ShellResult(False, "error", f"unknown view {name}")
            self.catalog.refresh(name, force=True)
            return ShellResult(True, "incremental", f"forced {name}")
        if op == "BATCH":
            try:
                refreshed = self.catalog.refresh_all()
            except Exception as ex:
                return ShellResult(False, "error", f"batch refresh failed: {ex}")
            return ShellResult(
                True, "incremental", f"refreshed {len(refreshed)} views", data=refreshed
            )
        return ShellResult(False, "error", "Usage: INCREMENTAL <STATS|FORCE|BATCH>")


def repl(spark: SparkSession, catalog: ViewCatalog, store=None) -> None:  # pragma: no cover
    """Terminal loop for interactive use (the reference's run loop,
    main.rs:118-180); commands go through the same execute() the tests
    drive."""
    shell = GraphShell(spark, catalog, store)
    while True:
        try:
            line = input("graphdb> ")
        except EOFError:
            break
        res = shell.execute(line)
        if res.kind == "exit":
            break
        if isinstance(res.data, DataFrame):
            res.data.show(20, truncate=False)
        elif res.data is not None:
            print(res.data)
        if res.message:
            print(res.message)
