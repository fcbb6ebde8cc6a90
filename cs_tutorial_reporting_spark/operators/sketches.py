"""[EXT] Portable mergeable sketches: HyperLogLog and Bloom filter.

Spark ships approx_count_distinct (HLL++) and an AQE runtime Bloom
join, but neither is *portable* — their hash functions (xxhash64)
differ from every other engine, so sketch CONTENTS can't be
value-checked by the DuckDB oracle and can't be shared with non-Spark
consumers. These implementations derive every hash from md5 (identical
bytes in every engine) and keep all arithmetic in integers/decimals,
so register tables, bitmaps, and the final estimates are bit-exact
reproducible anywhere — the sketch itself becomes an exchangeable
dataset (e.g. a daily distinct-users register table that any engine
can merge).

Portable HLL (p = 6, m = 64 registers by default):

- ``h60``     = first 60 bits of md5(key), via functions.text.hash60
- register    = top ``p`` bits  (``h60 div 2^(60-p)``)
- rho         = position of the first 1-bit in the remaining
                ``60-p`` bits (1-based), or ``60-p+1`` if all zero —
                computed EXACTLY via ``instr(lpad(bin(tail)))``, no
                floating log2 anywhere
- estimate    = alpha_m * m^2 / sum_j 2^(-M_j) computed in
                DECIMAL(38,0) fixed point: each register contributes
                the integer ``2^(MAX_RHO - M_j)`` (empty registers
                contribute ``2^MAX_RHO``), and the final divide is an
                integral ``div`` — both engines floor identically.
  alpha_64 is pinned to the rational 709/1000 (the float constant
  0.7213/(1+1.079/m) truncated; the portability contract needs A
  fixed rational, not the "best" one).

Scale design (100 TB): the register table is the ONLY shuffle payload
— ``m`` rows per group key regardless of input size; merging two days
of registers is ``max`` per (group, register), an associative
map-side-combinable agg. The estimate step reads m rows per group.

Portable Bloom filter (m_bits = 4096, k = 3 by default):

- position_i  = 60-bit md5 of (key || '#' || i)  mod  m_bits
- build:      distinct positions → 32-bit words via SUM of DISTINCT
              bit values (exact in both engines; bit_or is not
              portable SQL) → ``m_bits/32`` words COLLECTED to the
              driver (bounded: 128 bigints for the default sizing —
              same pattern as the IVF codebook collects,
              similarity.py) and re-broadcast as a literal array
- probe:      a key passes iff all k positions have their bit set in
              the literal array — pure JVM expressions, ZERO shuffle
              and zero extra scan on the probe side.

At 100 TB the probe side never shuffles for the prefilter: the bitmap
rides into every task as a plan literal (an explicit, engine-portable
version of Spark's runtime-filter pushdown). False positives are then
removed (when exactness is required) by the real semi-join, which now
shuffles only the surviving rows.

Reference: the reference engine has no sketch surface; this extends
SURVEY.md §2.8's training-pipeline mandate (dedup/cardinality at
corpus scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash60

#: top-of-hash bits used for the register index (m = 2**HLL_P)
HLL_P = 6
HLL_M = 1 << HLL_P  # 64 registers
#: bits left for the rho scan after the register index is peeled off
HLL_TAIL_BITS = 60 - HLL_P  # 54
#: rho when the tail is all zeros (max rho = TAIL_BITS + 1)
HLL_MAX_RHO = HLL_TAIL_BITS + 1  # 55
#: alpha_64 pinned as a rational — part of the portability contract
HLL_ALPHA_NUM, HLL_ALPHA_DEN = 709, 1000

BLOOM_M_BITS = 4096
BLOOM_K = 3
_WORD_BITS = 32


def hll_registers(
    df: DataFrame, group_cols: list[str], key_col: str
) -> DataFrame:
    """Per-group HLL register table: (group_cols..., reg, max_rho).

    This is the mergeable sketch: union two register tables and
    re-aggregate ``max(max_rho)`` to merge sketches. One hash shuffle,
    map-side combinable, output m rows per group at most.
    """
    tail_mod = 1 << HLL_TAIL_BITS
    base = df.select(
        *group_cols, hash60(F.col(key_col).cast("string")).alias("__h60")
    ).select(
        *group_cols,
        F.expr(f"CAST(__h60 div {tail_mod} AS INT)").alias("reg"),
        (F.col("__h60") % F.lit(tail_mod).cast("bigint")).alias("__tail"),
    )
    rho = F.when(F.col("__tail") == 0, F.lit(HLL_MAX_RHO)).otherwise(
        F.instr(F.lpad(F.bin(F.col("__tail")), HLL_TAIL_BITS, "0"), "1")
    )
    return (
        base.withColumn("rho", rho.cast("int"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Raw HLL estimate per group from a register table, in exact
    fixed-point arithmetic (no floats; both engines floor the final
    integral divide identically).

    sum_scaled = sum over ALL m registers of 2^(MAX_RHO - rho), where
    an absent register has rho = 0 ⇒ contributes 2^MAX_RHO.
    estimate = (alpha_num * m^2 * 2^MAX_RHO) div (alpha_den * sum_scaled)
    """
    scale = 1 << HLL_MAX_RHO
    per_reg = registers.select(
        *group_cols,
        F.expr(f"CAST(shiftleft(CAST(1 AS BIGINT), {HLL_MAX_RHO} - max_rho) AS BIGINT)").alias(
            "__contrib"
        ),
    )
    agg = per_reg.groupBy(*group_cols).agg(
        F.count("*").alias("n_registers"),
        F.sum("__contrib").alias("__present_sum"),
    )
    num = HLL_ALPHA_NUM * HLL_M * HLL_M * scale
    return agg.select(
        *group_cols,
        "n_registers",
        (
            F.col("__present_sum")
            + (F.lit(HLL_M) - F.col("n_registers")) * F.lit(scale).cast("bigint")
        ).alias("sum_scaled"),
    ).withColumn(
        "hll_estimate",
        F.expr(
            f"CAST((CAST({num} AS DECIMAL(38,0))) div "
            f"(CAST({HLL_ALPHA_DEN} AS DECIMAL(38,0)) * sum_scaled) AS BIGINT)"
        ),
    )


def hll_registers_sql(key_sql: str, from_sql: str, group_sql: str) -> str:
    """DuckDB twin of hll_registers as a SQL fragment (a full SELECT).

    ``key_sql`` must already be a VARCHAR expression; ``group_sql`` is
    a comma list of group columns.
    """
    h60 = f"CAST(concat('0x', substr(md5({key_sql}), 1, 15)) AS BIGINT)"
    tail_mod = 1 << HLL_TAIL_BITS
    return f"""
        SELECT {group_sql},
               CAST(h60 // {tail_mod} AS INT) AS reg,
               CAST(max(CASE WHEN h60 % {tail_mod} = 0 THEN {HLL_MAX_RHO}
                        ELSE strpos(lpad(bin(h60 % {tail_mod}), {HLL_TAIL_BITS}, '0'), '1')
                   END) AS INT) AS max_rho
        FROM (SELECT {group_sql}, {h60} AS h60 FROM {from_sql})
        GROUP BY {group_sql}, reg
    """


def hll_estimate_sql(registers_sql: str, group_sql: str) -> str:
    """DuckDB twin of hll_estimate over a register-table subquery."""
    scale = 1 << HLL_MAX_RHO
    num = HLL_ALPHA_NUM * HLL_M * HLL_M * scale
    return f"""
        SELECT {group_sql}, n_registers, sum_scaled,
               CAST(({num}::HUGEINT) // ({HLL_ALPHA_DEN}::HUGEINT * sum_scaled)
                    AS BIGINT) AS hll_estimate
        FROM (
            SELECT {group_sql},
                   count(*) AS n_registers,
                   CAST(sum((1::BIGINT << ({HLL_MAX_RHO} - max_rho)))
                        + ({HLL_M} - count(*)) * {scale}::BIGINT AS BIGINT)
                       AS sum_scaled
            FROM ({registers_sql})
            GROUP BY {group_sql}
        )
    """


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def _bloom_pos(key: F.Column, i: int) -> F.Column:
    """i-th portable bloom bit position of a (string-castable) key."""
    return hash60(F.concat(key.cast("string"), F.lit(f"#{i}"))) % F.lit(
        BLOOM_M_BITS
    )


def _bloom_pos_spark_sql(key_sql: str, i: int) -> str:
    """Spark-SQL string twin of _bloom_pos (for expr() contexts where
    shiftleft needs a column-valued shift — the Python API's shiftleft
    only takes a literal int)."""
    return (
        f"CAST(conv(substring(md5(concat(CAST({key_sql} AS STRING), '#{i}')),"
        f" 1, 15), 16, 10) AS BIGINT) % {BLOOM_M_BITS}"
    )


def bloom_build_words(
    spark: SparkSession, keys: DataFrame, key_col: str
) -> list[int]:
    """Build the bloom bitmap as ``m_bits/32`` signed-safe 32-bit words.

    Bounded driver collect (128 bigints at the default sizing) — the
    same pattern as the IVF codebook collects in similarity.py; NOT a
    hot-path collect. Words use SUM(DISTINCT bit_value): exact and
    portable, because each distinct set bit contributes its power of
    two exactly once and the word value stays < 2^32.
    """
    key = F.col(key_col)
    positions = keys.select(
        F.explode(
            F.array(*[_bloom_pos(key, i) for i in range(BLOOM_K)])
        ).alias("pos")
    ).distinct()
    words = (
        positions.select(
            (F.col("pos") / _WORD_BITS).cast("int").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))"
            ).alias("bit_value"),
        )
        .groupBy("word_idx")
        .agg(F.sum_distinct(F.col("bit_value")).alias("word"))
    )
    out = [0] * (BLOOM_M_BITS // _WORD_BITS)
    for r in words.collect():
        out[r.word_idx] = int(r.word)
    return out


def bloom_might_contain(words: list[int], key_sql: str) -> F.Column:
    """Pure-expression probe: true iff all k positions are set in the
    literal word array. Zero shuffle, zero extra scan — the bitmap is
    a plan literal riding into every task. ``key_sql`` is a Spark-SQL
    expression string for the key (e.g. a column name)."""
    arr = F.array(*[F.lit(w).cast("bigint") for w in words])
    checks = []
    for i in range(BLOOM_K):
        pos_sql = _bloom_pos_spark_sql(key_sql, i)
        word = F.element_at(
            arr, F.expr(f"CAST(({pos_sql}) div {_WORD_BITS} AS INT) + 1")
        )
        bit = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(({pos_sql}) % {_WORD_BITS} AS INT))"
        )
        checks.append(word.bitwiseAND(bit) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_pos_sql(key_sql: str, i: int) -> str:
    """DuckDB twin of _bloom_pos (key_sql must be VARCHAR already)."""
    return (
        f"CAST(concat('0x', substr(md5(concat({key_sql}, '#{i}')), 1, 15)) "
        f"AS BIGINT) % {BLOOM_M_BITS}"
    )
