"""Pure-python/numpy sketch cores (no Spark dependency).

Each sketch exposes the same mergeable-UDAF quadruple the reference's
library is, in effect, built around (SURVEY.md §2.7):

* ``ClassName(config...)``   — init (validates config driver-side)
* ``update_*`` / ``update_hashes`` — absorb a whole numpy batch (vectorized)
* ``merge(other)``           — associative + commutative combine
* ``estimate`` / ``contains_batch`` / ``quantile`` — finish
* ``to_bytes()`` / ``from_bytes()`` — versioned binary state, the blob that
  travels through Spark shuffles as a ``BinaryType`` column
"""

from probabilistic_rs_spark.sketches.bloom import (
    BloomConfig,
    BloomPartialBuilder,
    BloomSketch,
)
from probabilistic_rs_spark.sketches.cms import CountMinSketch
from probabilistic_rs_spark.sketches.native_bloom import (
    NativeBloomPartialBuilder,
    NativeBloomSketch,
)
from probabilistic_rs_spark.sketches.cuckoo import CuckooFilter, NativeCuckooFilter
from probabilistic_rs_spark.sketches.hll import HyperLogLog
from probabilistic_rs_spark.sketches.kll import KLLSketch
from probabilistic_rs_spark.sketches.quotient import QuotientFilter
from probabilistic_rs_spark.sketches.tdigest import TDigest

__all__ = [
    "BloomConfig",
    "BloomPartialBuilder",
    "BloomSketch",
    "NativeBloomPartialBuilder",
    "NativeBloomSketch",
    "CuckooFilter",
    "NativeCuckooFilter",
    "QuotientFilter",
    "HyperLogLog",
    "CountMinSketch",
    "TDigest",
    "KLLSketch",
]
