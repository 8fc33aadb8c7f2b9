"""Spark-exact xxHash64 of one BIGINT, as generated DuckDB SQL.

Spark's ``xxhash64(col)`` for a single LongType column is XXH64 of the
value's 8 little-endian bytes with seed 42 (public algorithm: Collet's
xxHash spec; Spark's ``XXH64.hashLong`` — one 8-byte lane + avalanche).
DuckDB has no xxhash64 built-in, so oracle parity for xxhash64-anchored
sketches (``hll_distinct_x64``) reimplements it as SQL arithmetic:

- lanes are UBIGINT; rotations/xors/shifts are native UBIGINT ops,
- wrapping multiply (mod 2⁶⁴) routes through HUGEINT with the multiplier
  split at 32 bits — ``a·b ≡ ((a·b_hi mod 2³²)·2³² + a·b_lo) (mod 2⁶⁴)``
  and every intermediate stays < 2⁹⁷, inside HUGEINT —
- each algorithm step is a named column in a chained subquery, so no
  subexpression is ever textually duplicated (a nested single-expression
  form would copy the input 2⁵ times).

The Python twin :func:`xxh64_long` is the driver-side reference, pinned
against both engines by ``tests/test_sketches.py::test_xxh64_sql_matches_
spark_xxhash64``.
"""

from __future__ import annotations

_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_M = 1 << 64
_M_LIT = "18446744073709551616"  # 2^64
_SEED = 42
_INIT = (_SEED + _P5 + 8) % _M  # seed + PRIME64_5 + input length (8 bytes)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) % _M


def xxh64_long(v: int, seed: int = _SEED) -> int:
    """Driver-side reference of Spark's ``xxhash64`` over one BIGINT
    (signed result, like Spark's)."""
    v %= _M
    h = (seed + _P5 + 8) % _M
    h ^= (_rotl((v * _P2) % _M, 31) * _P1) % _M
    h = (_rotl(h, 27) * _P1 + _P4) % _M
    h ^= h >> 33
    h = (h * _P2) % _M
    h ^= h >> 29
    h = (h * _P3) % _M
    h ^= h >> 32
    return h - _M if h >= (1 << 63) else h


def _wmul(a: str, b: int) -> str:
    """``(a * b) mod 2^64`` for a UBIGINT sql expr and a constant b."""
    bhi, blo = b >> 32, b & 0xFFFFFFFF
    return (
        f"CAST((((({a})::HUGEINT * {bhi}) % 4294967296) * 4294967296 "
        f"+ (({a})::HUGEINT * {blo})) % {_M_LIT} AS UBIGINT)"
    )


def _rotl_sql(x: str, r: int) -> str:
    # DuckDB's << coerces through signed BIGINT and overflow-checks at
    # 2^63, so the left shift routes through HUGEINT with an explicit
    # mod-2^64 wrap; the right shift stays native UBIGINT.
    return (
        f"(CAST(((({x})::HUGEINT << {r}) % {_M_LIT}) AS UBIGINT) "
        f"| (({x}) >> {64 - r}))"
    )


def xxh64_u64_sql_from(v_expr: str, inner_sql: str, carry_cols: str) -> str:
    """DuckDB SQL producing column ``h_u`` = XXH64(v, seed 42) as UBIGINT.

    ``inner_sql`` is the FROM-able relation text providing ``v_expr``
    (a BIGINT; NULL hashes to the bare seed, matching Spark's
    null-field-skipped semantics); ``carry_cols`` are passthrough columns
    kept alongside. Each algorithm step is one subquery level.
    """
    u0 = (
        f"CAST(((COALESCE({v_expr}, 0))::HUGEINT % {_M_LIT} + {_M_LIT}) "
        f"% {_M_LIT} AS UBIGINT)"
    )
    s1 = f"SELECT {carry_cols}, ({v_expr}) IS NULL AS v_null, {u0} AS u FROM ({inner_sql})"
    s2 = f"SELECT {carry_cols}, v_null, {_wmul('u', _P2)} AS a FROM ({s1})"
    s3 = f"SELECT {carry_cols}, v_null, {_rotl_sql('a', 31)} AS b FROM ({s2})"
    s4 = f"SELECT {carry_cols}, v_null, xor({_INIT}::UBIGINT, {_wmul('b', _P1)}) AS h1 FROM ({s3})"
    s5 = (
        f"SELECT {carry_cols}, v_null, CAST(({_wmul(_rotl_sql('h1', 27), _P1)}::HUGEINT "
        f"+ {_P4}) % {_M_LIT} AS UBIGINT) AS h2 FROM ({s4})"
    )
    s6 = f"SELECT {carry_cols}, v_null, {_wmul('xor(h2, h2 >> 33)', _P2)} AS h3 FROM ({s5})"
    s7 = f"SELECT {carry_cols}, v_null, {_wmul('xor(h3, h3 >> 29)', _P3)} AS h4 FROM ({s6})"
    return (
        f"SELECT {carry_cols}, CASE WHEN v_null THEN {_SEED}::UBIGINT "
        f"ELSE xor(h4, h4 >> 32) END AS h_u FROM ({s7})"
    )
