from probabilistic_rs_spark.streaming.expiring import (  # noqa: F401
    streaming_windowed_bloom,
    streaming_windowed_sketch,
)
from probabilistic_rs_spark.streaming.ops_feed import (  # noqa: F401
    generation_ops_sink,
    start_generation_feed,
)
from probabilistic_rs_spark.streaming.persistence import (  # noqa: F401
    start_persisted_windowed_bloom,
    windowed_bloom_chunk_sink,
)
