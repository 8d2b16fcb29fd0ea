"""Shared cross-engine (Spark <-> DuckDB oracle) primitives for the ops suite.

Every operator in dint_spark.ops is verified against a DuckDB SQL oracle by
the driver, so all hashing / quantization must be *bit-identical* across the
two engines. The primitives below are chosen for that property:

  - tokenization: lower + split on [^0-9a-z]+ (same as the index tokenizer)
  - string hash H(s): first 15 hex chars of md5(s) as int64 (60 bits,
    positive in signed 64-bit; verified identical in Spark and DuckDB)
  - score quantization: compute in float64 from identical inputs, then
    floor(x * 1e6) -> int64; single IEEE ops are bit-identical across engines
  - integer-quantized embeddings: floor(x * 2^20) per component, so dot
    products / norms are exact int64 arithmetic (order-independent sums)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[^0-9a-z]+"
HASH_HEX_LEN = 15  # 60 bits < 2^63
EMB_SCALE = 1 << 20

# MinHash parameters: p = 2^31-1 (Mersenne prime), 16 (a, b) pairs from a
# fixed LCG so both engines embed the same literals.
MINHASH_P = 2147483647


def _lcg_params(n: int = 16, seed: int = 0x5EED) -> list[tuple[int, int]]:
    x = seed
    out = []
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = x % (MINHASH_P - 1) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % MINHASH_P
        out.append((a, b))
    return out


MINHASH_PARAMS = _lcg_params()
MINHASH_BANDS = 4
MINHASH_ROWS = 4  # hashes per band; BANDS * ROWS == len(MINHASH_PARAMS)

SIMHASH_BITS = 60
SIMHASH_WORD = 15  # 4 words of 15 bits


def hash60(col: Column) -> Column:
    """H(s): int64 in [0, 2^60) — Spark side."""
    return F.conv(F.substring(F.md5(col), 1, HASH_HEX_LEN), 16, 10).cast("long")


def sql_hash60(expr: str) -> str:
    """H(s) — DuckDB side (verified identical to hash60)."""
    return f"(('0x' || substr(md5({expr}), 1, {HASH_HEX_LEN}))::UBIGINT)::BIGINT"


def tokens_col(text_col: str = "text") -> Column:
    """lower -> split -> drop empties; identical to the index tokenizer and
    to the SQL toks CTE."""
    return F.array_remove(F.split(F.lower(F.col(text_col)), TOKEN_RE), "")


SQL_TOKS = """
toks AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '[^0-9a-z]+')) AS term
  FROM documents
),
toks2 AS (SELECT doc_id, term FROM toks WHERE term <> '')
"""


def q6(col: Column) -> Column:
    """floor(x * 1e6) -> int64 quantization (float64 in, exact out)."""
    return F.floor(col.cast("double") * F.lit(1000000.0)).cast("long")


def sql_q6(expr: str) -> str:
    return f"floor(({expr})::DOUBLE * 1000000.0)::BIGINT"
