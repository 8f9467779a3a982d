"""Boot the cFlux-compatible HTTP edge:

    python -m cflux_spark [--root DIR] [--host H] [--port N] [--cpus N]

Parity with the reference's entrypoint (``node cflux.js`` serving
/write, /query, /ping on $PORT — cflux.js:861): one process, one
store root, the same three routes plus the SHOW/CREATE/DELETE
families the reference stubs. The dev server is wsgiref and serves
requests serially (single writer per store by design — see
api/http.serve); a production deployment mounts ``CFluxApp`` under a
real WSGI server with the same single-writer-per-db discipline.
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None, run_forever: bool = True):
    p = argparse.ArgumentParser(
        prog="python -m cflux_spark",
        description="InfluxDB-API-compatible analytics engine on PySpark",
    )
    p.add_argument("--root", default="./cflux_data", help="store root directory")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8086, help="0 = ephemeral")
    p.add_argument("--cpus", type=int, default=0, help="local[] cores (0 = all)")
    a = p.parse_args(argv)

    from cflux_spark.api.http import serve
    from cflux_spark.session import get_spark

    spark = get_spark("cflux_spark_server", cpus=a.cpus or None)
    server, app, port = serve(spark, a.root, a.host, a.port)
    print(f"cflux_spark listening on http://{a.host}:{port} (root={a.root})", flush=True)
    if not run_forever:
        return server, app, port
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        spark.stop()
    return None


if __name__ == "__main__":
    main()
