"""Portable deterministic hashing (Spark ⇄ DuckDB).

Spark's built-in ``hash``/``xxhash64`` and DuckDB's ``hash`` are different
algorithms, so sketch operators (MinHash, SimHash, fingerprints) built on
them could never be oracle-checked. Instead all sketches here hash through
md5 — identical in every engine — and map the first 15 hex chars (60 bits)
to a BIGINT:

    Spark : conv(substr(md5(x), 1, 15), 16, 10) :: long
    DuckDB: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)

MinHash uses the classic (a·h + b) mod P family over that base hash with
P = 2^31 - 1 (products stay < 2^62, no 64-bit overflow). Coefficients are
generated from a fixed seed at import; the same Python values are inlined
into both the Spark plan and the oracle SQL, so the two sides can never
drift.

md5 is ~2× slower than xxhash64 JVM-side; at 100 TB you would switch the
base hash to ``F.xxhash64`` (one-line change here) and lose only the
cross-engine oracle, not correctness.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2_147_483_647  # 2^31 - 1

_rng = random.Random(42)
NUM_MINHASH = 16
MINHASH_A = [_rng.randrange(1, MERSENNE31) for _ in range(NUM_MINHASH)]
MINHASH_B = [_rng.randrange(0, MERSENNE31) for _ in range(NUM_MINHASH)]
LSH_BANDS = 4  # 4 bands × 4 rows over the 16-slot signature


def md5_long(col: Column) -> Column:
    """60-bit positive integer hash, portable across engines."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB rendering of ``md5_long``."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def minhash_slot(base: Column, i: int) -> Column:
    """h_i(x) = (a_i·(x mod P) + b_i) mod P, for the i-th hash function."""
    return (F.lit(MINHASH_A[i]) * (base % MERSENNE31) + F.lit(MINHASH_B[i])) % MERSENNE31


def minhash_slot_sql(base_expr: str, i: int) -> str:
    return f"({MINHASH_A[i]} * ({base_expr} % {MERSENNE31}) + {MINHASH_B[i]}) % {MERSENNE31}"
