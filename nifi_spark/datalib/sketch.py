"""Mergeable sketches: Count-Min, HyperLogLog registers, heavy hitters.

Corpus telemetry at 100 TB runs on sketches — frequency estimates over
token/host/url streams (Count-Min), distinct counts per slice
(HyperLogLog), and exact heavy hitters for the head of the distribution.
Spark's built-ins (approx_count_distinct etc.) are engine-private and
non-replayable; these are built on the portable md5 hash so every
register and counter is DETERMINISTIC and the DuckDB oracle reproduces
the sketch bit-for-bit — the sketch itself, not just a tolerance band.

Scale shapes (all are one hash-agg with map-side combine):
* ``count_min_sketch``: (row, bucket) partial counts merge associatively
  — the canonical mergeable CM layout; depth×width cells out.
* ``hll_registers``: register = max(rho) per bucket — max is the HLL
  merge, so partial aggregation IS sketch union. ``hll_estimate`` turns
  registers into the HLL++-style estimate driver-side.
* ``heavy_hitters``: exact top-k by count (count + one window over the
  k-bounded survivors) — at web scale prefilter with the CM sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from nifi_spark.functions.portable_hash import portable_hash64


def count_min_sketch(df: DataFrame, col: str, width: int = 1024,
                     depth: int = 4, seed: str = "") -> DataFrame:
    """(row, bucket, n): depth independent hash rows, bucket =
    portable_hash64(row_salt + value) % width. Estimate a value's count
    with ``cm_estimate``; union sketches by summing matching cells."""
    c = F.col(col).cast("string")
    rows = [F.struct(F.lit(d).alias("row"),
                     (portable_hash64(c, f"{seed}cm{d}:") % width)
                     .cast("int").alias("bucket"))
            for d in range(depth)]
    return (df.select(F.explode(F.array(*rows)).alias("h"))
            .groupBy(F.col("h.row").alias("row"),
                     F.col("h.bucket").alias("bucket"))
            .agg(F.count("*").cast("long").alias("n")))


def cm_estimate(sketch_rows: list, value: str, width: int = 1024,
                depth: int = 4, seed: str = "") -> int:
    """Point query against collected sketch rows: min over the depth
    cells (the classic CM upper-bound estimate)."""
    from nifi_spark.functions.portable_hash import portable_hash64_py
    cells = {(r["row"], r["bucket"]): r["n"] for r in sketch_rows}
    return min(cells.get(
        (d, portable_hash64_py(str(value), f"{seed}cm{d}:") % width), 0)
        for d in range(depth))


def hll_registers(df: DataFrame, col: str, b: int = 10,
                  seed: str = "") -> DataFrame:
    """(bucket, rho): HyperLogLog registers over m = 2^b buckets.
    bucket = top b bits of the portable 60-bit hash; rho = 1 + leading
    zeros of the remaining 60-b bits (capped when the suffix is 0).
    max() is the merge, so partial aggregation is sketch union and the
    register table is exactly reproducible in SQL."""
    h = portable_hash64(F.col(col).cast("string"), seed)  # 60-bit value
    m = 1 << b
    suffix_bits = 60 - b
    bucket = F.shiftrightunsigned(h, suffix_bits).cast("int")
    suffix = h % F.lit(1 << suffix_bits)
    # rho = position of the highest set bit from the left within the
    # suffix: suffix_bits - floor(log2(suffix)) expressed via bit_length
    rho = F.when(suffix == 0, F.lit(suffix_bits + 1)).otherwise(
        F.lit(suffix_bits) - (F.length(F.bin(suffix)) - 1))
    return (df.select(bucket.alias("bucket"), rho.cast("int").alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("rho")))


def hll_estimate(register_rows: list, b: int = 10) -> float:
    """Driver-side HLL estimate with the standard small-range
    (linear-counting) correction."""
    import math
    m = 1 << b
    regs = {r["bucket"]: r["rho"] for r in register_rows}
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else \
        {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    s = sum(2.0 ** -regs.get(j, 0) for j in range(m))
    est = alpha * m * m / s
    zeros = m - len(regs)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est


def heavy_hitters(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Exact top-k values by count with a deterministic tiebreak
    (count desc, value asc): (value, n, rank)."""
    counts = (df.groupBy(F.col(col).cast("string").alias("value"))
              .agg(F.count("*").cast("long").alias("n")))
    w = Window.orderBy(F.col("n").desc(), F.col("value"))
    # the global window only ever sees k-ish survivors: pre-cut with a
    # per-partition top-k so the single-reducer sort is bounded
    pre = (counts.withColumn(
        "_p", F.spark_partition_id())
        .withColumn("_r", F.row_number().over(
            Window.partitionBy("_p").orderBy(F.col("n").desc(),
                                             F.col("value"))))
        .where(F.col("_r") <= k).drop("_p", "_r"))
    return (pre.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def histogram_sketch(df: DataFrame, col: str, lo: float, hi: float,
                     bins: int = 256) -> DataFrame:
    """(bin, n): fixed-width histogram over [lo, hi) with underflow bin
    -1 and overflow bin `bins` — the mergeable quantile sketch for
    telemetry columns with a known range (doc lengths, token counts,
    scores). One hash-agg; union = cell sum. Binning is IEEE double
    arithmetic — floor((v - lo) * bins / (hi - lo)) — evaluated in the
    SAME expression order by the SQL twin, so cross-engine replay relies
    on identical double rounding (both engines are IEEE-754), not on
    integer exactness; a value just below `hi` can legitimately round
    into the overflow bin on both sides."""
    if hi <= lo or bins <= 0:
        raise ValueError("need hi > lo and bins > 0")
    v = F.col(col).cast("double")
    raw = F.floor((v - F.lit(float(lo))) * bins / F.lit(float(hi - lo)))
    b = (F.when(v < lo, F.lit(-1))
         .when(v >= hi, F.lit(bins))
         .otherwise(raw)).cast("int")
    return (df.select(b.alias("bin"))
            .groupBy("bin").agg(F.count("*").cast("long").alias("n")))


def histogram_quantile(rows: list, q: float, lo: float, hi: float,
                       bins: int = 256) -> float:
    """Driver-side quantile estimate from collected histogram rows:
    linear interpolation within the bin containing the q-th row.
    Underflow/overflow bins clamp to lo/hi."""
    counts = {r["bin"]: r["n"] for r in rows}
    total = sum(counts.values())
    if total == 0:
        raise ValueError("empty histogram")
    target = q * total
    acc = 0
    width = (hi - lo) / bins
    for b in sorted(counts):
        n = counts[b]
        if acc + n >= target:
            if b < 0:
                return lo
            if b >= bins:
                return hi
            frac = (target - acc) / n if n else 0.0
            return lo + (b + frac) * width
        acc += n
    return hi


def bloom_bits(df: DataFrame, col: str, m_words: int = 256,
               k: int = 4, seed: str = "") -> DataFrame:
    """Bloom filter as (word, bits): m_words 63-bit words (bit index
    stays below the sign bit, so every mask is a positive long —
    ANSI-safe), k portable-hash probes per value. Build = one explode
    + one bit_or hash-agg; UNION of two filters = bit_or of matching
    words (partial aggregation IS the merge, like the other sketches);
    the word table replays bit-for-bit in SQL. Membership via
    `bloom_contains`."""
    m_bits = m_words * 63
    c = F.col(col).cast("string")
    probes = [F.struct(
        (portable_hash64(c, f"{seed}bf{i}:") % m_bits).alias("pos"))
        for i in range(k)]
    cells = (df.select(F.explode(F.array(*probes)).alias("h"))
             .select(F.col("h.pos").alias("pos"))
             .selectExpr("CAST(pos DIV 63 AS INT) AS word",
                         "SHIFTLEFT(CAST(1 AS BIGINT), "
                         "CAST(pos % 63 AS INT)) AS mask"))
    return (cells.groupBy("word")
            .agg(F.bit_or("mask").alias("bits")))


def bloom_contains(bits_rows: list, value: str, m_words: int = 256,
                   k: int = 4, seed: str = "") -> bool:
    """Point query against collected (word, bits) rows: every probe
    bit set -> maybe present (no false negatives)."""
    from nifi_spark.functions.portable_hash import portable_hash64_py
    words = {r["word"]: r["bits"] for r in bits_rows}
    m_bits = m_words * 63
    for i in range(k):
        pos = portable_hash64_py(str(value), f"{seed}bf{i}:") % m_bits
        if not (words.get(pos // 63, 0) >> (pos % 63)) & 1:
            return False
    return True
