"""Z-order data layout (SURVEY §2.1 SNK1 extension): multi-dimensional
clustering for scan pruning at 100 TB.

A single-column sort bounds per-file min/max on ONE column; predicates on
any other column still read every file. Interleaving the bits of several
bucketized columns into one Morton (Z) key and range-partitioning the
write on it bounds per-file ranges on EVERY participating column at once,
so parquet footer min/max stats prune files/row-groups for predicates on
any of them — the same layout idea behind lakehouse OPTIMIZE ZORDER.

Everything stays codegen-able column arithmetic: equal-frequency bucket
ranks via ntile (deterministic under a total order), bit interleave as
shift/OR terms, then ``repartitionByRange`` + ``sortWithinPartitions`` on
the key. No UDFs, no collect.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def interleave_bits(cols: list, bits: int = 8):
    """Morton-interleave ``len(cols)`` bucket-rank columns of ``bits`` bits
    each into one long: bit b of column i lands at position b*ndim + i.
    Pure shift/AND/OR arithmetic — whole-stage codegen keeps it JVM-side,
    and the identical integer expression runs in any SQL engine."""
    ndim = len(cols)
    terms = []
    for i, c in enumerate(cols):
        c = F.col(c) if isinstance(c, str) else c
        for b in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
                    b * ndim + i,
                )
            )
    return reduce(lambda acc, t: acc.bitwiseOR(t), terms)


def zorder_ranks(
    df: DataFrame, cols: list[str], tiebreak: str, bits: int = 8
) -> DataFrame:
    """Append __r0..__rN equal-frequency bucket ranks (0..2^bits-1) for
    each layout column. ntile over a (col, tiebreak) total order is
    deterministic and needs no boundary collect; ties are broken by the
    caller's unique column so both engines agree bucket-for-bucket.

    Scale note: each ntile is one global sort of (col, tiebreak) — at
    fleet scale swap for approxQuantile boundaries + range lookup to cut
    the per-column sort to a sample pass; the bucket CONTRACT (rank in
    [0, 2^bits)) and everything downstream stay identical."""
    out = df
    n = 1 << bits
    for i, c in enumerate(cols):
        w = Window.orderBy(F.col(c), F.col(tiebreak))
        out = out.withColumn(f"__r{i}", F.ntile(n).over(w) - 1)
    return out


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    tiebreak: str,
    bits: int = 8,
    num_files: int = 16,
    fmt: str = "parquet",
) -> None:
    """Cluster ``df`` on the Z-key of ``cols`` and write ``num_files``
    files: range-partition by the key (contiguous Z-ranges per file, so
    per-file min/max of every layout column is bounded), sort within each
    partition (bounds ROW-GROUP stats too), drop the helper columns."""
    ranks = zorder_ranks(df, cols, tiebreak, bits)
    keyed = ranks.withColumn(
        "__z", interleave_bits([f"__r{i}" for i in range(len(cols))], bits)
    )
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__r{i}" for i in range(len(cols))])
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )
