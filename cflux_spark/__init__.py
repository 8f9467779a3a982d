"""cflux_spark — a PySpark-native time-series analytics engine.

Re-implements the capability surface of metrico/cFlux (an InfluxDB-API
gateway over ClickHouse; see SURVEY.md) as an idiomatic Spark engine:

- ``model``      — schemas, series fingerprinting, registry semantics
- ``sources``    — line-protocol parsing, batch readers/writers
- ``operators``  — the relational operator library (SURVEY.md §2)
- ``functions``  — scalar/column helpers (time, tags, labels)
- ``plans``      — InfluxQL front-end compiling to DataFrame plans
- ``streaming``  — Structured Streaming ingest (micro-batch parity)
- ``extensions`` — dedup / similarity / text / multimodal operators

Everything is DataFrame-first: logical plans are declared via the
DataFrame/SQL API and physical strategy is left to Catalyst + AQE.
"""

__version__ = "0.1.0"

from cflux_spark.session import get_spark  # noqa: F401
