from cflux_spark.model.schemas import (  # noqa: F401
    SAMPLES_SCHEMA,
    TIME_SERIES_SCHEMA,
    SUBSCRIPTIONS_SCHEMA,
)
from cflux_spark.model.fingerprint import (  # noqa: F401
    canonical_labels_json,
    fingerprint_py,
    fingerprint_col,
)
