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
        # Session-wide knob: Arrow batch size has no per-DataFrame
        # scope in Spark, so this deliberately applies to the whole
        # session (and is visible to later unrelated Arrow operations).
        # set_arrow_block_size() is the explicit spelling; callers that
        # need the old value back should save/restore it themselves.
        set_arrow_block_size(df.sparkSession, block_size)
    return ArrayTable(df, vec_col)


def set_arrow_block_size(spark, block_size: int) -> str | None:
    """Set the session-level Arrow batch size (rows per batch crossing
    the JVM/Python boundary) and return the PREVIOUS value so callers
    can restore it: a per-table argument cannot be scoped narrower
    because maxRecordsPerBatch is a session conf."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(block_size))
    return prev


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


class SparseTable:
    """SparseRDD-compatible facade [ref: splearn/rdd.py SparseRDD ·
    C:H] over LONG-FORM sparse data: a DataFrame of (row, col, val)
    COO triplets. The reference blocked scipy.sparse matrices per
    partition; the Spark-native representation of the same data is the
    long form every text operator here already uses (ml_text.py's
    (doc_id, term, tf)), so this facade wraps that and compiles each
    method to the plan you would write by hand:

      * ``sum/mean(axis=0)`` — groupBy(col) partial sums, never a
        driver loop; implicit zeros contribute nothing to sums and are
        accounted for in means by dividing by the DENSE row count;
      * ``dot(A)`` — distributed SpMM as join + aggregate: triplets
        hash-join the broadcast-able long form of A on ``col``, then
        groupBy(row, j) sums val·A[col, j]. Only nonzeros shuffle.
      * ``to_vector(dim)`` — densify to an ArrayTable (map_from_entries
        + sequence/transform, all codegen), the bridge INTO the dense
        blocked API; ``to_long()`` is the bridge out.

    Rows with no nonzeros do not exist in COO form and therefore do
    not appear in ``dot``/``to_vector`` output unless ``n_rows`` is
    given to ``to_scipy`` (which re-inserts them as empty rows).
    """

    def __init__(self, df: DataFrame, row_col: str = "row",
                 col_col: str = "col", val_col: str = "val"):
        self.df = df
        self.row_col, self.col_col, self.val_col = row_col, col_col, val_col

    # -- constructors / materializers -----------------------------
    @classmethod
    def from_scipy(cls, spark, X) -> "SparseTable":
        """Driver-local scipy matrix → distributed COO triplets (test
        and small-data path; big data should arrive long-form)."""
        coo = X.tocoo()
        rows = [(int(r), int(c), float(v))
                for r, c, v in zip(coo.row, coo.col, coo.data)]
        return cls(spark.createDataFrame(rows, "row long, col long, val double"))

    def to_scipy(self, shape: tuple[int, int] | None = None):
        """Collect to a local scipy CSR matrix (explicitly local, like
        the reference's collect)."""
        from scipy import sparse

        pdf = self.df.select(self.row_col, self.col_col, self.val_col).toPandas()
        if shape is None:
            shape = (int(pdf[self.row_col].max()) + 1 if len(pdf) else 0,
                     int(pdf[self.col_col].max()) + 1 if len(pdf) else 0)
        return sparse.coo_matrix(
            (pdf[self.val_col], (pdf[self.row_col], pdf[self.col_col])),
            shape=shape,
        ).tocsr()

    @classmethod
    def from_dense(cls, spark, X: np.ndarray) -> "SparseTable":
        """numpy ndarray → COO triplets of its nonzeros (pure-numpy
        twin of from_scipy; the container has no scipy)."""
        X = np.asarray(X, dtype=np.float64)
        rr, cc = np.nonzero(X)
        rows = [(int(r), int(c), float(X[r, c])) for r, c in zip(rr, cc)]
        return cls(spark.createDataFrame(rows, "row long, col long, val double"))

    def to_dense(self, shape: tuple[int, int] | None = None) -> np.ndarray:
        """Collect to a local dense ndarray (explicitly local)."""
        pdf = self.df.select(self.row_col, self.col_col, self.val_col).toPandas()
        if shape is None:
            shape = (int(pdf[self.row_col].max()) + 1 if len(pdf) else 0,
                     int(pdf[self.col_col].max()) + 1 if len(pdf) else 0)
        out = np.zeros(shape)
        out[pdf[self.row_col], pdf[self.col_col]] = pdf[self.val_col]
        return out

    def to_long(self) -> DataFrame:
        """The underlying (row, col, val) DataFrame — bridge OUT of the
        compat layer into native long-form operators (ml_text.py)."""
        return self.df

    # -- introspection --------------------------------------------
    def nnz(self) -> int:
        return self.df.count()

    @property
    def shape(self) -> tuple[int, int]:
        """Dense logical shape inferred from max indices (one agg job);
        empty trailing rows/cols are invisible in COO form."""
        r = self.df.agg(
            F.max(self.row_col).alias("r"), F.max(self.col_col).alias("c")
        ).first()
        return ((r["r"] or -1) + 1, (r["c"] or -1) + 1)

    # -- distributed math -----------------------------------------
    def sum(self, axis: int | None = None, n_cols: int | None = None):
        """[ref: SparseRDD.sum · C:M] — scalar or per-column sums over
        nonzeros (zeros contribute nothing, so COO sums are exact).

        axis=0 returns a length-``n_cols`` vector (default: the
        inferred ``shape[1]``), matching scipy's dense semantics —
        trailing all-zero columns are REPRESENTED as zeros, not
        silently dropped (they would be if the output were sized from
        the max nonzero column of the sums alone)."""
        if axis is None:
            return float(self.df.agg(F.sum(self.val_col)).first()[0] or 0.0)
        if axis != 0:
            raise ValueError("axis must be None or 0")
        d = n_cols if n_cols is not None else self.shape[1]
        rows = (self.df.groupBy(self.col_col)
                .agg(F.sum(self.val_col).alias("s")).collect())
        extent = max((r[0] for r in rows), default=-1) + 1
        if n_cols is not None and extent > n_cols:
            # scipy raises on shape/data mismatch; silently widening
            # past the caller's declared width would hand back a shape
            # they did not ask for
            raise ValueError(
                f"nonzero column extent {extent} exceeds declared n_cols {n_cols}"
            )
        out = np.zeros(max(d, extent))
        for r in rows:
            out[r[0]] = r["s"]
        return out

    def mean(self, axis: int | None = None, n_rows: int | None = None,
             n_cols: int | None = None):
        """Dense-semantics mean: divides by the DENSE element count
        (n_rows × n_cols for axis=None, n_rows for axis=0), which is
        what scipy's .mean() does. ``n_rows``/``n_cols`` override the
        inferred shape when trailing all-zero rows/columns exist."""
        n, d = self.shape
        n = n_rows if n_rows is not None else n
        d = n_cols if n_cols is not None else d
        s = self.sum(axis, n_cols=d) if axis == 0 else self.sum(axis)
        if axis is None:
            return s / (n * d) if n and d else 0.0
        return s / n if n else s

    def dot(self, other: np.ndarray) -> ArrayTable:
        """[ref: SparseRDD.dot · C:M] — X_sparse · A_dense as a
        distributed join-aggregate SpMM: A goes long-form (col, j, a)
        and is broadcast (it is d×k, driver-local by contract), each
        nonzero joins its A row, groupBy(row, j) sums the products,
        and the k per-row sums densify to one array<double>. All
        codegen; only nnz·k intermediate rows, never n·d."""
        from pyspark.sql.functions import broadcast

        A = np.asarray(other, dtype=np.float64)
        if A.ndim == 1:
            A = A[:, None]
        d, k = A.shape
        spark = self.df.sparkSession
        # A's zeros are kept: dropping them would also drop output
        # rows whose only nonzero X columns hit zero A coefficients,
        # breaking the "present iff the row has a nonzero" contract.
        a_rows = [(c, j, float(A[c, j])) for c in range(d) for j in range(k)]
        a_df = spark.createDataFrame(a_rows, "acol long, j long, a double")
        prod = (
            self.df.join(broadcast(a_df),
                         F.col(self.col_col) == F.col("acol"), "inner")
            .groupBy(F.col(self.row_col).alias("row"), "j")
            .agg(F.sum(F.col(self.val_col) * F.col("a")).alias("s"))
        )
        dense = (
            prod.groupBy("row")
            .agg(F.map_from_entries(F.collect_list(F.struct("j", "s"))).alias("m"))
            .select(
                "row",
                F.transform(
                    F.sequence(F.lit(0), F.lit(k - 1)),
                    lambda j: F.coalesce(F.element_at("m", j.cast("long")), F.lit(0.0)),
                ).alias("features"),
            )
        )
        return ArrayTable(dense, "features")

    def to_vector(self, dim: int) -> ArrayTable:
        """Densify each present row to a length-``dim`` array — the
        bridge INTO the dense blocked API. map_from_entries + sequence
        transform, entirely JVM-side; absent (all-zero) rows stay
        absent, mirroring their absence in COO form."""
        out = (
            self.df.groupBy(F.col(self.row_col).alias("row"))
            .agg(F.map_from_entries(
                F.collect_list(F.struct(self.col_col, self.val_col))).alias("m"))
            .select(
                "row",
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda j: F.coalesce(F.element_at("m", j.cast("long")), F.lit(0.0)),
                ).alias("features"),
            )
        )
        return ArrayTable(out, "features")
