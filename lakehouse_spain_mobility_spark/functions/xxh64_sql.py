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


def xxh64_u64_sql_from(
    v_expr: str, inner_sql: str, carry_cols: str, seed_col: str | None = None
) -> str:
    """DuckDB SQL producing column ``h_u`` = XXH64(v, seed) as UBIGINT.

    ``inner_sql`` is the FROM-able relation text providing ``v_expr``
    (a BIGINT; NULL hashes to the bare seed, matching Spark's
    null-field-skipped semantics); ``carry_cols`` are passthrough columns
    kept alongside. Each algorithm step is one subquery level.

    ``seed_col`` (round 10): name of a UBIGINT column in ``inner_sql``
    providing a PER-ROW seed — the hook that makes Spark's multi-column
    ``xxhash64(a, b)`` replayable, since Spark chains columns by feeding
    each field's hash in as the next field's seed
    (``XxHash64Function.hash``). None keeps the constant seed 42 with
    its precomputed init.
    """
    if seed_col is None:
        init = f"{_INIT}::UBIGINT"
        null_h = f"{_SEED}::UBIGINT"
        carry_in = carry_cols
    else:
        # init = (seed + P5 + 8) mod 2^64, seed itself already < 2^64
        init = (
            f"CAST((__seed::HUGEINT + {(_P5 + 8) % _M}) % {_M_LIT} AS UBIGINT)"
        )
        null_h = "__seed"
        carry_in = f"{carry_cols}, {seed_col} AS __seed"
        carry_cols = f"{carry_cols}, __seed"
    # internal step aliases are __-prefixed so they can never collide
    # with carried caller columns (the pair form carries the second input
    # through the first hash's subquery chain)
    u0 = (
        f"CAST(((COALESCE({v_expr}, 0))::HUGEINT % {_M_LIT} + {_M_LIT}) "
        f"% {_M_LIT} AS UBIGINT)"
    )
    s1 = f"SELECT {carry_in}, ({v_expr}) IS NULL AS __vnull, {u0} AS __u FROM ({inner_sql})"
    s2 = f"SELECT {carry_cols}, __vnull, {_wmul('__u', _P2)} AS __a FROM ({s1})"
    s3 = f"SELECT {carry_cols}, __vnull, {_rotl_sql('__a', 31)} AS __b FROM ({s2})"
    s4 = f"SELECT {carry_cols}, __vnull, xor({init}, {_wmul('__b', _P1)}) AS __h1 FROM ({s3})"
    s5 = (
        f"SELECT {carry_cols}, __vnull, CAST(({_wmul(_rotl_sql('__h1', 27), _P1)}::HUGEINT "
        f"+ {_P4}) % {_M_LIT} AS UBIGINT) AS __h2 FROM ({s4})"
    )
    s6 = f"SELECT {carry_cols}, __vnull, {_wmul('xor(__h2, __h2 >> 33)', _P2)} AS __h3 FROM ({s5})"
    s7 = f"SELECT {carry_cols}, __vnull, {_wmul('xor(__h3, __h3 >> 29)', _P3)} AS __h4 FROM ({s6})"
    return (
        f"SELECT {carry_cols}, CASE WHEN __vnull THEN {null_h} "
        f"ELSE xor(__h4, __h4 >> 32) END AS h_u FROM ({s7})"
    )


def xxh64_pair_u64_sql_from(
    a_expr: str, b_expr: str, inner_sql: str, carry_cols: str
) -> str:
    """DuckDB SQL producing ``h_u`` = Spark's ``xxhash64(a, b)`` over two
    BIGINT columns as UBIGINT: field hashes chain as seeds —
    ``hash(b, hash(a, 42))`` (Spark ``XxHash64``'s fold over fields)."""
    first = xxh64_u64_sql_from(a_expr, inner_sql, f"{carry_cols}, {b_expr}")
    # rename the first hash so the second pass can both seed from it and
    # drop it from the carry
    mid = f"SELECT {carry_cols}, {b_expr}, h_u AS __hseed FROM ({first})"
    second = xxh64_u64_sql_from(b_expr, mid, carry_cols, seed_col="__hseed")
    return second


def xxh64_pair_long(a: int, b: int) -> int:
    """Driver-side reference of Spark's ``xxhash64(a, b)`` (signed)."""
    h1 = xxh64_long(a)
    return xxh64_long(b, h1 % _M)


def xxh64_pair_np(a, b):
    """Vectorized numpy twin of Spark's ``xxhash64(a, b)`` for int64
    arrays — the Python-kernel side of hash parity (uint64 arithmetic
    wraps mod 2^64 natively, so each step is one array op; pinned
    against Spark in tests/test_sketches.py)."""
    import numpy as np

    p1 = np.uint64(_P1)
    p2 = np.uint64(_P2)
    p3 = np.uint64(_P3)
    p4 = np.uint64(_P4)

    def rotl(x, r):
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    def one(v, seed):
        h = seed + np.uint64((_P5 + 8) % _M)
        h = h ^ (rotl(v * p2, 31) * p1)
        h = rotl(h, 27) * p1 + p4
        h = h ^ (h >> np.uint64(33))
        h = h * p2
        h = h ^ (h >> np.uint64(29))
        h = h * p3
        h = h ^ (h >> np.uint64(32))
        return h

    av = np.asarray(a, dtype=np.int64).astype(np.uint64)
    bv = np.asarray(b, dtype=np.int64).astype(np.uint64)
    seed0 = np.full(av.shape, np.uint64(_SEED))
    h1 = one(av, seed0)
    return one(bv, h1).astype(np.int64)
