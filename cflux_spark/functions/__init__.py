from cflux_spark.functions.scalars import (  # noqa: F401
    props_tag,
    props_map,
    label_matcher,
)
