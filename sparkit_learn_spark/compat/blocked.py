"""splearn blocked-RDD API compatibility layer [ref: splearn/rdd.py
ArrayRDD / DictRDD / block() · C:H], re-expressed over DataFrames.

The reference's core abstraction is partition-local batching: an
ArrayRDD is an RDD of ndarray blocks, a DictRDD zips several of them
column-aligned, and every estimator works block-wise. Spark's
DataFrame + Arrow already IS that model — `mapInPandas` hands each
task an iterator of pandas batches (the blocks), columns coexist
natively (DictRDD's zip is just `select`), and blocking/unblocking
are no-ops. This module keeps the reference's METHOD SURFACE so
splearn code ports line-for-line, while every operation compiles to
the DataFrame plan a Spark-first design would write by hand:

  * ``sum/mean(axis=0)`` — posexplode + groupBy(pos): per-partition
    partial sums merged by Spark (the reference's reduce-of-block-sums
    [ref: splearn/rdd.py ArrayRDD.sum · C:H]), never a driver loop;
  * ``dot(A)`` — per-batch X·A with A broadcast once [ref:
    splearn/rdd.py ArrayRDD.dot · C:M], the blocked-matmul execution
    model the similarity operators also use;
  * ``transform(fn)`` — Arrow-batched mapInPandas, fn sees an ndarray
    block exactly as in the reference [ref: splearn/rdd.py
    ArrayRDD.transform · C:H].

Driver state is never more than one scalar / one dim-sized vector;
``collect``-family methods are explicitly local materializations,
same as the reference's.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def block(df: DataFrame, vec_col: str = "features",
          block_size: int | None = None) -> "ArrayTable":
    """[ref: splearn/rdd.py block() · C:H] — wrap a DataFrame's array
    column as an ArrayTable. ``block_size`` maps to Arrow batch size
    (set ``spark.sql.execution.arrow.maxRecordsPerBatch``); the
    DataFrame itself needs no physical re-batching."""
    if block_size is not None:
        df.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(block_size)
        )
    return ArrayTable(df, vec_col)


class ArrayTable:
    """ArrayRDD-compatible facade over (id?, array<numeric>) data.

    The underlying DataFrame is exposed as ``.df`` — mixing facade
    calls with native DataFrame code is the intended migration path.
    """

    def __init__(self, df: DataFrame, vec_col: str = "features"):
        self.df = df
        self.vec_col = vec_col

    # -- layout introspection -------------------------------------
    @property
    def blocks(self) -> int:
        """[ref: ArrayRDD.blocks · C:H] — physical partition count."""
        return self.df.rdd.getNumPartitions()

    def getNumPartitions(self) -> int:
        return self.blocks

    @property
    def shape(self) -> tuple[int, int]:
        """[ref: ArrayRDD.shape · C:H] — (n_rows, n_cols); triggers a
        count plus one first() for the width, like the reference."""
        first = self.df.select(self.vec_col).first()
        width = len(first[0]) if first is not None else 0
        return (self.df.count(), width)

    @property
    def ndim(self) -> int:
        return 2

    # -- element access -------------------------------------------
    def count(self) -> int:
        return self.df.count()

    def first(self) -> np.ndarray:
        row = self.df.select(self.vec_col).first()
        return np.asarray(row[0], dtype=np.float64)

    def collect(self) -> np.ndarray:
        """[ref: ArrayRDD.collect · C:H] — local n×d ndarray (Arrow)."""
        pdf = self.df.select(self.vec_col).toPandas()
        return np.array([np.asarray(v, dtype=np.float64) for v in pdf[self.vec_col]])

    toarray = collect

    def tolist(self) -> list:
        return self.collect().tolist()

    def unblock(self) -> DataFrame:
        """[ref: BlockRDD.unblock · C:H] — a no-op by design: rows were
        never physically blocked."""
        return self.df

    def __getitem__(self, key) -> "ArrayTable":
        """Row slice in the DataFrame's current order [ref:
        ArrayRDD.__getitem__ · C:H]. Non-negative start/stop slices
        only (global negative indexing needs a total count first —
        call .count() and slice explicitly, same cost as the
        reference's)."""
        if not isinstance(key, slice) or key.step not in (None, 1):
            raise TypeError("only contiguous row slices are supported")
        start, stop = key.start or 0, key.stop
        if start < 0 or (stop is not None and stop < 0):
            raise ValueError("negative slice bounds unsupported; use .count()")
        out = self.df.offset(start)
        if stop is not None:
            out = out.limit(max(stop - start, 0))
        return ArrayTable(out, self.vec_col)

    # -- storage --------------------------------------------------
    def persist(self, *args) -> "ArrayTable":
        self.df = self.df.persist(*args)
        return self

    cache = persist

    def unpersist(self) -> "ArrayTable":
        self.df = self.df.unpersist()
        return self

    # -- distributed math -----------------------------------------
    def _elems(self):
        return self.df.select(
            F.posexplode(F.col(self.vec_col).cast("array<double>")).alias("pos", "v")
        )

    def sum(self, axis: int | None = None):
        """[ref: ArrayRDD.sum · C:H] — axis=None scalar, axis=0 per-
        column sums (distributed partial sums; driver sees one scalar
        or one d-vector)."""
        if axis is None:
            row_sum = F.aggregate(
                F.col(self.vec_col).cast("array<double>"),
                F.lit(0.0), lambda a, v: a + v,
            )
            return float(self.df.select(F.sum(row_sum)).first()[0])
        if axis != 0:
            raise ValueError("axis must be None or 0")
        rows = self._elems().groupBy("pos").agg(F.sum("v").alias("s")).collect()
        out = np.zeros(max((r["pos"] for r in rows), default=-1) + 1)
        for r in rows:
            out[r["pos"]] = r["s"]
        return out

    def mean(self, axis: int | None = None):
        """[ref: ArrayRDD.mean · C:H]."""
        n = self.count()
        s = self.sum(axis)
        return s / n if n else s

    def dot(self, other: np.ndarray) -> "ArrayTable":
        """[ref: ArrayRDD.dot · C:M] — distributed × local matmul:
        one X_block·A BLAS call per Arrow batch, A broadcast once."""
        import pandas as pd

        A = np.asarray(other, dtype=np.float64)
        b_A = self.df.sparkSession.sparkContext.broadcast(A)
        vec_col = self.vec_col

        def run(batches):
            M = b_A.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array([np.asarray(v, np.float64) for v in pdf[vec_col]])
                yield pd.DataFrame({vec_col: list(X @ M)})

        out = self.df.select(vec_col).mapInPandas(
            run, schema=f"{vec_col} array<double>"
        )
        return ArrayTable(out, vec_col)

    def transform(self, fn: Callable[[np.ndarray], np.ndarray],
                  dtype: str = "double") -> "ArrayTable":
        """[ref: ArrayRDD.transform · C:H] — apply fn block-wise; fn
        receives/returns a 2-D ndarray per Arrow batch."""
        import pandas as pd

        vec_col = self.vec_col

        def run(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array([np.asarray(v, np.float64) for v in pdf[vec_col]])
                yield pd.DataFrame({vec_col: list(np.asarray(fn(X)))})

        out = self.df.select(vec_col).mapInPandas(
            run, schema=f"{vec_col} array<{dtype}>"
        )
        return ArrayTable(out, vec_col)


class DictTable:
    """DictRDD-compatible facade [ref: splearn/rdd.py DictRDD · C:H]:
    named, row-aligned columns. The reference zipped separate RDDs to
    get alignment; DataFrame columns are born aligned, so construction
    is a select and projection is free."""

    def __init__(self, df: DataFrame, columns: Sequence[str]):
        missing = set(columns) - set(df.columns)
        if missing:
            raise ValueError(f"columns not in DataFrame: {sorted(missing)}")
        self.df = df.select(*columns)
        self.columns = tuple(columns)

    def get(self, column: str) -> ArrayTable:
        """[ref: DictRDD.get / __getitem__[:, col] · C:H]."""
        if column not in self.columns:
            raise KeyError(column)
        return ArrayTable(self.df, column)

    def __getitem__(self, key) -> ArrayTable:
        if isinstance(key, tuple):  # dictrdd[:, 'X'] idiom
            key = key[1]
        return self.get(key)

    def count(self) -> int:
        return self.df.count()

    def transform(self, fn: Callable[[np.ndarray], np.ndarray],
                  column: str, dtype: str = "double") -> "DictTable":
        """[ref: DictRDD.transform(column=...) · C:H] — block-wise fn
        on ONE column, all other columns pass through row-aligned in
        the same Arrow batch (alignment is structural, not zipped)."""
        import pandas as pd

        if column not in self.columns:
            raise KeyError(column)
        others = [c for c in self.columns if c != column]
        fields = ", ".join(
            f"{name} {dt}" if name != column else f"{column} array<{dtype}>"
            for name, dt in self.df.dtypes
        )
        col_order = list(self.columns)  # plain locals only: the closure
        # ships to executors and must not capture self (DataFrame/
        # SparkContext are driver-only)

        def run(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array([np.asarray(v, np.float64) for v in pdf[column]])
                out = pdf[others].copy() if others else pd.DataFrame(index=pdf.index)
                out[column] = list(np.asarray(fn(X)))
                yield out[col_order]

        return DictTable(self.df.mapInPandas(run, schema=fields), self.columns)
