from probabilistic_rs_spark.streaming.expiring import (  # noqa: F401
    streaming_windowed_bloom,
    streaming_windowed_sketch,
)
