import numpy as np

from probably_jl_spark.sketches.hashing import (
    mix64,
    mix64_scalar,
    popcount64,
    trailing_zeros64,
    xxhash64_bytes,
    xxhash64_long,
    xxhash64_long_array,
)


def test_popcount_and_tz():
    xs = np.array([1, 2, 3, 0xFFFFFFFFFFFFFFFF, 1 << 63, 0x8000000000000001], dtype=np.uint64)
    assert popcount64(xs).tolist() == [1, 1, 2, 64, 1, 2]
    assert trailing_zeros64(xs).tolist() == [0, 1, 0, 0, 63, 0]


def test_tz_random_vs_python():
    rs = np.random.default_rng(1)
    xs = rs.integers(1, 2**64, size=1000, dtype=np.uint64)
    tz = trailing_zeros64(xs)
    for x, t in zip(xs.tolist(), tz.tolist()):
        assert (x >> t) & 1 == 1 and x % (1 << t) == 0


def test_xxhash64_known_vectors():
    # XXH64 reference vectors (seed 0): xxhash spec / python-xxhash
    assert xxhash64_bytes(b"", seed=0) == 0xEF46DB3751D8E999
    assert xxhash64_bytes(b"xxhash", seed=0) == 0x32DD38952C4BC720


def test_xxhash64_long_matches_bytes_path():
    # hashing a long == hashing its 8 little-endian bytes
    for v in [0, 1, 42, 2**63, 2**64 - 1, 123456789]:
        assert xxhash64_long(v) == xxhash64_bytes(v.to_bytes(8, "little"), seed=42)


def test_xxhash64_vectorized_matches_scalar():
    rs = np.random.default_rng(2)
    vals = rs.integers(-(2**63), 2**63, size=500, dtype=np.int64)
    vec = xxhash64_long_array(vals)
    for v, h in zip(vals.tolist(), vec.tolist()):
        assert xxhash64_long(v & (2**64 - 1)) == h


def test_mix64_vector_matches_scalar():
    rs = np.random.default_rng(3)
    hs = rs.integers(0, 2**64, size=200, dtype=np.uint64)
    for salt in [0, 1, 7, 0x1B873593]:
        vec = mix64(hs, salt)
        for h, m in zip(hs.tolist(), vec.tolist()):
            assert mix64_scalar(h, salt) == m


def test_xxhash64_matches_spark(spark):
    """The Python xxhash64 must be bit-identical to Spark's (the
    distributed/driver hashing contract, SURVEY.md §7.2)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a"), (42, "hello world"), (-7, ""), (2**62, "conv-00000001"), (0, None)],
        "lv: long, sv: string",
    )
    rows = df.select(
        "lv",
        "sv",
        F.xxhash64("lv").alias("hl"),
        F.xxhash64("sv").alias("hs"),
        F.xxhash64("lv", "sv").alias("hc"),
    ).collect()
    from probably_jl_spark.sketches.hashing import xxhash64_any, xxhash64_cols

    M = 2**64
    for r in rows:
        assert xxhash64_any(r.lv) % M == r.hl % M
        assert xxhash64_cols(r.sv) % M == r.hs % M
        assert xxhash64_cols(r.lv, r.sv) % M == r.hc % M


def test_xxhash64_int32_path_matches_spark(spark):
    """Spark hashes IntegerType through a 4-byte path — int_bytes=4 must
    reproduce it (review finding: driver point queries over int32-keyed
    builds used the long path and silently disagreed)."""
    from pyspark.sql import functions as F

    from probably_jl_spark.sketches.hashing import xxhash64_any

    df = spark.createDataFrame([(7,), (-3,), (2**31 - 1,)], "iv: int")
    rows = df.select("iv", F.xxhash64("iv").alias("h")).collect()
    M = 2**64
    for r in rows:
        assert xxhash64_any(r.iv, int_bytes=4) % M == r.h % M
        assert xxhash64_any(r.iv) % M != r.h % M  # long path differs


def test_popcount64_full_range_and_shapes():
    """The shared 16-bit-table popcount (one implementation for bloom
    loadfactor AND the SimHash hamming probes — code-review r5 removed a
    duplicate) matches bin().count over random words and boundary
    values."""
    rng = np.random.default_rng(3)
    xs = rng.integers(0, 2**63, size=1000, dtype=np.int64).view(np.uint64)
    xs = np.concatenate([xs, np.array([0, 1, 2**64 - 1, 2**63], dtype=np.uint64)])
    got = popcount64(xs)
    want = [bin(int(v)).count("1") for v in xs]
    assert got.tolist() == want
