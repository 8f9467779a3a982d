from cflux_spark.sources.lineprotocol import parse_line, parse_lines  # noqa: F401
from cflux_spark.sources.readers import load_tables, table_path  # noqa: F401
