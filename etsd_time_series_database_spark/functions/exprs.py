"""JVM-side expression helpers (no Python UDFs in any of these).

Numeric conventions for engine-vs-oracle determinism
----------------------------------------------------
Floating-point SUM/AVG are order-dependent, and a distributed engine
sums in partition order while a single-node oracle sums sequentially.
Every aggregate that crosses rows therefore goes through DECIMAL
(exact, associative), and only the final scalar is cast back to
DOUBLE and rounded to 6 places:

    sum(x)  -> cast(round(sum(cast(x as decimal(18,6))), 6) as double)
    avg(x)  -> round(cast(sum_dec as double) / count(x), 6)

Per-row arithmetic (a*b, a-b, a/b) is bit-identical across IEEE-754
engines as long as the textual expression shape matches, so row-level
math stays in fast double codegen. This is also the right call at
100 TB: decimal partial aggregates are associative, so map-side
combine stays correct and the merge order chosen by AQE can't change
the answer.

Timestamps are exchanged as epoch microseconds (BIGINT) to dodge
engine/session timezone rendering differences.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def epoch_us(col: Column | str) -> Column:
    """Timestamp -> epoch microseconds (BIGINT). DuckDB: epoch_us(ts)."""
    return F.unix_micros(_c(col))


def epoch_s(col: Column | str) -> Column:
    """Timestamp -> whole epoch seconds (BIGINT). DuckDB: epoch_us(ts)//1000000."""
    return F.floor(F.unix_micros(_c(col)) / F.lit(1_000_000)).cast("bigint")


def round6(col: Column) -> Column:
    return F.round(col, 6)


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent exact SUM of a double column; see module doc.

    No round(): the decimal partial sums are exact, so the final
    double is bit-identical to any sequential oracle — round() itself
    is NOT portable across engines (Spark rounds via BigDecimal of the
    shortest decimal repr, DuckDB via float multiply) and is avoided.
    """
    return F.sum(_c(col).cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / exact count — the
    final double division is IEEE-deterministic on both engines."""
    c = _c(col)
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def bucket_epoch(col: Column | str, width_s: int) -> Column:
    """Tumbling-window bucket start in epoch seconds (BIGINT).

    Pure integer arithmetic so Spark and any ANSI oracle agree:
    (epoch_us div (width*1e6)) * width.  This is the RRA consolidation
    bucket of the reference's RRD export (reference
    code/plugins/edoRRD.c:44-74, RRA spec in
    'ECM-1240 storage format 2.txt:127-148').
    """
    w_us = width_s * 1_000_000
    return (F.floor(F.unix_micros(_c(col)) / F.lit(w_us)) * F.lit(width_s)).cast("bigint")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sequential-order dot product of two array<float/double> columns.

    F.aggregate folds left-to-right, matching a sequential oracle
    exactly up to ulps; stays in Catalyst codegen (no UDF).
    """
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cosine(a,b) as double; compose of dot/norms (all codegen)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


FP_MOD = 1_000_000_007
FP_BASE = 31


def poly_fingerprint(text: Column | str) -> Column:
    """Deterministic rolling polynomial hash of a string (document
    fingerprinting for dedup pipelines): h = (h*31 + ascii(ch)) mod 1e9+7.

    Expressed with sequence/transform/aggregate so it runs in the JVM
    and is reproducible in ANSI SQL (DuckDB list_reduce) — unlike
    engine-builtin hash() which is not portable across engines.
    """
    c = _c(text)
    codes = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.ascii(F.substr(c, i, F.lit(1))),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * FP_BASE + x.cast("bigint")) % F.lit(FP_MOD),
    )


def sq_l2_distance(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance between two array<float/double> columns as a
    sequential left-to-right fold (same oracle-matching shape as
    dot_product); stays in Catalyst codegen."""
    diffs = F.zip_with(
        _c(a),
        _c(b),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)
