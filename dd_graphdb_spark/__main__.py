"""`python -m dd_graphdb_spark` — launch the interactive shell.

The reference ships a terminal binary (src/main.rs:1002 → run loop
main.rs:118-180); this is the equivalent entry point over the Spark
engine: a local session, a ViewCatalog at --warehouse, an optional
GraphStore at --store, and the same GraphShell the tests and the REST
API drive.

    python -m dd_graphdb_spark [--warehouse DIR] [--store DIR]
                               [--cpus N] [--api [PORT]]

With --api, the REST surface (api.GraphApiServer) is served alongside
the shell on the same catalog.
"""

from __future__ import annotations

import argparse
import tempfile


def main() -> None:
    ap = argparse.ArgumentParser(prog="dd_graphdb_spark", description=__doc__)
    ap.add_argument(
        "--warehouse",
        default=None,
        help="view-catalog directory (default: a fresh temp dir)",
    )
    ap.add_argument(
        "--store",
        default=None,
        help="attach a GraphStore at this directory (enables mutations)",
    )
    ap.add_argument("--cpus", default=None, help="local[N] cores (default: env/32)")
    ap.add_argument(
        "--api",
        nargs="?",
        const=8080,
        type=int,
        default=None,
        metavar="PORT",
        help="also serve the REST API on PORT (default 8080)",
    )
    args = ap.parse_args()

    from dd_graphdb_spark import get_spark
    from dd_graphdb_spark.shell import repl
    from dd_graphdb_spark.views import ViewCatalog

    spark = get_spark("dd-graphdb-shell", cpus=args.cpus)
    warehouse = args.warehouse or tempfile.mkdtemp(prefix="graphdb_views_")
    catalog = ViewCatalog(spark, warehouse)
    store = None
    if args.store is not None:
        from dd_graphdb_spark.storage import GraphStore

        store = GraphStore(spark, args.store)

    server = None
    if args.api is not None:
        from dd_graphdb_spark.api import GraphApiServer
        from dd_graphdb_spark.shell import GraphShell

        server = GraphApiServer(
            GraphShell(spark, catalog, store), port=args.api
        ).start()
        print(f"REST API on http://127.0.0.1:{server.port}/")

    print(f"warehouse: {warehouse}  (type 'help' for commands, 'quit' to exit)")
    try:
        repl(spark, catalog, store)
    finally:
        if server is not None:
            server.stop()
        spark.stop()


if __name__ == "__main__":
    main()
