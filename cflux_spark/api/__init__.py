from cflux_spark.api.http import CFluxApp, serve  # noqa: F401
