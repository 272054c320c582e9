"""Wire-format fuzz sweep across ALL sketch families.

The reference maps corrupt input to a typed error
(``BloomError::SerializationError``, src/error.rs) rather than a panic;
the round-6 media codecs carry the same gate (truncations + byte flips →
ValueError or a valid decode, never a crash). This applies that sweep to
every sketch family's ``from_bytes``: any truncation and any single-byte
corruption must either raise a Sketch*Error (or ValueError subclass) or
deserialize into SOME state object — never segfault, hang, or escape
with an unrelated exception type. Deserializing to a WRONG state is
acceptable for payload-byte flips (checksums are the chunk store's job —
``chunkstore.py`` digests blobs); crashing or mis-typing the failure is
not, because a fleet-scale job must be able to quarantine a corrupt
state file and keep folding the rest.
"""

from __future__ import annotations

import numpy as np
import pytest

from probabilistic_rs_spark.errors import SketchConfigError, SketchStateError


def _families():
    from probabilistic_rs_spark.sketches.bloom import BloomConfig, BloomSketch
    from probabilistic_rs_spark.sketches.cms import CountMinSketch
    from probabilistic_rs_spark.sketches.countsketch import CountSketch
    from probabilistic_rs_spark.sketches.cuckoo import CuckooFilter
    from probabilistic_rs_spark.sketches.hll import HyperLogLog
    from probabilistic_rs_spark.sketches.kll import KLLSketch
    from probabilistic_rs_spark.sketches.mg import MisraGries
    from probabilistic_rs_spark.sketches.native_bloom import NativeBloomSketch
    from probabilistic_rs_spark.sketches.quotient import QuotientFilter
    from probabilistic_rs_spark.sketches.tdigest import TDigest
    from probabilistic_rs_spark.sketches.theta import ThetaSketch

    rng = np.random.default_rng(42)
    hashes = rng.integers(0, 1 << 63, 200, dtype=np.int64).view(np.uint64)
    base2 = np.stack(
        [
            rng.integers(0, 1 << 62, 200, dtype=np.int64),
            rng.integers(0, 1 << 56, 200, dtype=np.int64),
        ],
        axis=1,
    )
    floats = rng.normal(size=200)

    fams = {}

    bloom = BloomSketch(BloomConfig(capacity=500, false_positive_rate=0.03))
    bloom.update_batch([f"k{i}".encode() for i in range(100)])
    fams["bloom"] = (BloomSketch, bloom.to_bytes())

    nb = NativeBloomSketch(BloomConfig(capacity=500, false_positive_rate=0.03))
    nb.update_base_hashes(base2)
    fams["native_bloom"] = (NativeBloomSketch, nb.to_bytes())

    hll = HyperLogLog(p=12)
    hll.update_hashes(hashes)
    fams["hll_sparse"] = (HyperLogLog, hll.to_bytes())
    hll2 = HyperLogLog(p=6, sparse_threshold=0)
    hll2.update_hashes(hashes)
    fams["hll_dense"] = (HyperLogLog, hll2.to_bytes())

    cms = CountMinSketch(eps=0.01, delta=0.1)
    cms.update_hashes(hashes)
    fams["cms"] = (CountMinSketch, cms.to_bytes())

    cs = CountSketch(eps=0.1, delta=0.05)
    cs.update_base_hashes(base2)
    fams["countsketch"] = (CountSketch, cs.to_bytes())

    td = TDigest()
    td.update_values(floats)
    fams["tdigest"] = (TDigest, td.to_bytes())

    kll = KLLSketch(k=64)
    kll.update_values(floats)
    fams["kll"] = (KLLSketch, kll.to_bytes())

    ck = CuckooFilter(capacity=512)
    ck.insert_hashes(np.unique(hashes))
    fams["cuckoo"] = (CuckooFilter, ck.to_bytes())

    qf = QuotientFilter(capacity=512)
    qf.update_hashes(hashes)
    fams["quotient"] = (QuotientFilter, qf.to_bytes())

    th = ThetaSketch(k=16)
    th.update_hashes(hashes)
    fams["theta"] = (ThetaSketch, th.to_bytes())

    mg = MisraGries(k=32)
    mg.update_batch([f"key{i % 50}" for i in range(200)])
    fams["mg"] = (MisraGries, mg.to_bytes())

    return fams


_ACCEPTABLE = (SketchStateError, SketchConfigError, ValueError)


class TestWireFuzz:
    @pytest.mark.parametrize("name", sorted(_families().keys()))
    def test_round_trip_identity(self, name):
        cls, blob = _families()[name]
        assert cls.from_bytes(blob).to_bytes() == blob

    @pytest.mark.parametrize("name", sorted(_families().keys()))
    def test_truncations_never_crash(self, name):
        cls, blob = _families()[name]
        # every prefix length: 0, 1, …, len-1 for short states; a stride
        # for long ones, always including the boundary-adjacent lengths
        n = len(blob)
        lengths = set(range(0, min(n, 64)))
        lengths |= {n - 1, n - 2, n // 2, n // 3, n - 9, n - 8, n - 7}
        for ln in sorted(x for x in lengths if 0 <= x < n):
            try:
                sk = cls.from_bytes(blob[:ln])
            except _ACCEPTABLE:
                continue
            # parsed despite truncation: must still be re-serializable
            assert isinstance(sk.to_bytes(), bytes)

    @pytest.mark.parametrize("name", sorted(_families().keys()))
    def test_byte_flips_never_crash(self, name):
        cls, blob = _families()[name]
        n = len(blob)
        # all header/meta bytes + a stride through the payload
        positions = list(range(0, min(n, 48))) + list(range(48, n, max(1, n // 64)))
        for pos in positions:
            for flip in (0xFF, 0x01, 0x80):
                bad = bytearray(blob)
                bad[pos] ^= flip
                try:
                    sk = cls.from_bytes(bytes(bad))
                except _ACCEPTABLE:
                    continue
                except OverflowError:
                    # a flipped meta byte can turn a size/param into a
                    # value numpy/struct refuses loudly — acceptable
                    continue
                assert isinstance(sk.to_bytes(), bytes)

    @pytest.mark.parametrize("name", sorted(_families().keys()))
    def test_cross_family_rejection(self, name):
        """Feeding family A's bytes to family B's deserializer must raise
        (wire-tag dispatch — reference idiom of typed config headers)."""
        fams = _families()
        cls, _ = fams[name]
        for other, (_, blob) in fams.items():
            if other == name or (cls is fams[other][0]):
                continue
            with pytest.raises(_ACCEPTABLE):
                cls.from_bytes(blob)
