"""Database / Table catalog over Parquet with a JSON metadata index.

Maps Scanner's table store (DatabaseDescriptor / TableDescriptor /
per-column binary items; reference: /root/reference/scanner/metadata.proto:6-128,
python/scannerpy/client.py:239-265) onto a directory of Parquet tables plus a
``_catalog.json`` descriptor.  Parquet supplies the column-oriented layout,
statistics, predicate pushdown and partition pruning that the reference
implemented by hand (per-column item files + sparse-read heuristics,
python/scannerpy/column.py:78-211).

Commit semantics: Scanner marks tables committed only after all tasks finish
(master.cpp:1116); here a table directory is written with Spark's atomic
rename-based committer and then recorded in the catalog — a table absent
from the catalog is uncommitted garbage, mirroring the reference's
``committed`` flag.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from scanner_spark import streams as S

_CATALOG = "_catalog.json"

# Gap width below which requested rows are read as one sequential interval
# instead of point lookups — the reference's load_sparsity_threshold
# (rpc.proto:252 default 8, applied in python/scannerpy/column.py:114-118).
LOAD_SPARSITY_THRESHOLD = 8


def _coalesce_rows(
    wanted: list[int], threshold: int
) -> tuple[list[tuple[int, int]], list[int], bool]:
    """Split a sorted row-index list into (intervals, singles, exact):
    runs whose inter-row gap is < ``threshold`` merge into [lo, hi]
    intervals; isolated rows stay singles.  ``exact`` is False when any
    merged interval covers indices that were not requested (gap > 1), so
    the caller knows to re-trim."""
    intervals: list[tuple[int, int]] = []
    singles: list[int] = []
    exact = True
    i = 0
    while i < len(wanted):
        j = i
        while j + 1 < len(wanted) and wanted[j + 1] - wanted[j] < threshold:
            j += 1
        if j == i:
            singles.append(wanted[i])
        else:
            intervals.append((wanted[i], wanted[j]))
            if wanted[j] - wanted[i] != j - i:
                exact = False
        i = j + 1
    return intervals, singles, exact


def sparse_load(
    df: DataFrame,
    columns: list[str] | None = None,
    rows: list[int] | None = None,
    ranges: list[tuple[int, int]] | None = None,
    idx_col: str = "idx",
) -> DataFrame:
    """Sparse row-subset read — the reference's ``Column.load(rows=…)``
    with its ``load_sparsity_threshold`` heuristic
    (python/scannerpy/column.py:114-118, rpc.proto:252), re-expressed as
    parquet predicate pushdown:

    - ``columns``: projection, pruned at the scan (ReadSchema);
    - ``ranges``: half-open ``(start, end)`` index ranges, pushed as
      BETWEEN predicates so row-group min/max stats skip everything else
      — the dense-read path;
    - ``rows``: explicit row indices.  Runs the reference's sparsity
      heuristic: requested rows are coalesced into intervals wherever the
      gap is under ``LOAD_SPARSITY_THRESHOLD`` (dense stretches read
      sequentially as BETWEEN), the isolated remainder becomes an IN list
      (point lookups) — the same choice the C++ engine made between
      sequential and striped reads.

    All predicates reach the parquet scan (PushedFilters), so at 100 TB
    the I/O is proportional to the requested row set, not the table."""
    import functools
    import operator

    from pyspark.sql import functions as F

    if (rows is not None or ranges is not None) and idx_col not in df.columns:
        raise ValueError(f"DataFrame has no index column {idx_col!r}")
    preds = []
    if ranges is not None:
        for start, end in ranges:
            preds.append(F.col(idx_col).between(int(start), int(end) - 1))
    if rows is not None:
        wanted = sorted(set(int(r) for r in rows))
        intervals, singles, exact = _coalesce_rows(wanted, LOAD_SPARSITY_THRESHOLD)
        cover = [F.col(idx_col).between(a, b) for a, b in intervals]
        if singles:
            cover.append(F.col(idx_col).isin(singles))
        if cover:
            pred = functools.reduce(operator.or_, cover)
            if not exact:
                # coalescing widened dense stretches over sub-threshold
                # gaps (sequential read beats striping); trim back to the
                # exact request — evaluated only on interval survivors
                pred = pred & F.col(idx_col).isin(wanted)
            preds.append(pred)
    if preds:
        df = df.filter(functools.reduce(operator.or_, preds))
    elif rows is not None or ranges is not None:
        # an explicit EMPTY request means zero rows, not the whole table
        df = df.filter(F.lit(False))
    return df.select(*columns) if columns else df


@dataclass
class TableInfo:
    name: str
    path: str
    columns: list[str] = field(default_factory=list)
    num_rows: int | None = None
    committed: bool = True
    created_at: float = 0.0


class Database:
    """A flat namespace of named stream tables under one directory."""

    def __init__(self, spark: SparkSession, db_path: str):
        self.spark = spark
        self.db_path = db_path
        os.makedirs(db_path, exist_ok=True)
        self._tables: dict[str, TableInfo] = {}
        self._load_catalog()

    # -- catalog persistence ------------------------------------------------
    def _catalog_path(self) -> str:
        return os.path.join(self.db_path, _CATALOG)

    def _load_catalog(self) -> None:
        p = self._catalog_path()
        if os.path.exists(p):
            with open(p) as f:
                raw = json.load(f)
            self._tables = {k: TableInfo(**v) for k, v in raw.get("tables", {}).items()}

    def _save_catalog(self) -> None:
        tmp = self._catalog_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"tables": {k: vars(v) for k, v in self._tables.items()}}, f, indent=1
            )
        os.replace(tmp, self._catalog_path())  # atomic commit of metadata

    # -- table ops ------------------------------------------------------------
    def has_table(self, name: str) -> bool:
        return name in self._tables

    def table_names(self) -> list[str]:
        return sorted(self._tables)

    def new_table(
        self,
        name: str,
        rows: list[dict] | DataFrame,
        schema: str | None = None,
        overwrite: bool = False,
    ) -> DataFrame:
        """Create a table from literal rows or a DataFrame (reference:
        client.py:1068-1122 / master.cpp:366-433)."""
        if self.has_table(name) and not overwrite:
            raise ValueError(f"table {name!r} exists (pass overwrite=True)")
        df = rows if isinstance(rows, DataFrame) else self.spark.createDataFrame(rows, schema=schema)
        return self.write_table(name, df, overwrite=overwrite)

    def write_table(self, name: str, df: DataFrame, overwrite: bool = False) -> DataFrame:
        path = os.path.join(self.db_path, f"{name}.parquet")
        mode = "overwrite" if overwrite else "errorifexists"
        df.write.mode(mode).parquet(path)
        self._tables[name] = TableInfo(
            name=name,
            path=path,
            columns=df.columns,
            num_rows=None,  # filled lazily; counting 100 TB on write is waste
            committed=True,
            created_at=time.time(),
        )
        self._save_catalog()
        return self.table(name)

    def write_bucketed(
        self,
        name: str,
        df: DataFrame,
        bucket_cols: list[str],
        num_buckets: int = 32,
        overwrite: bool = False,
    ) -> DataFrame:
        """Materialize a table hash-bucketed (and sorted) on join keys.

        The 100 TB co-location path: two tables bucketed identically on
        their join key sort-merge-join with NO Exchange and NO per-task
        sort — the shuffle is paid once at write time instead of per
        query.  Uses the session catalog (``bucketBy`` requires
        ``saveAsTable``); read it back with ``bucketed_table``."""
        writer = (
            df.write.format("parquet")
            .bucketBy(num_buckets, *bucket_cols)
            .sortBy(*bucket_cols)
        )
        if overwrite:
            writer = writer.mode("overwrite")
        writer.saveAsTable(name)
        self._tables[name] = TableInfo(
            name=name,
            path=f"spark_catalog:{name}",
            columns=df.columns,
            num_rows=None,
            committed=True,
            created_at=time.time(),
        )
        self._save_catalog()
        return self.bucketed_table(name)

    def bucketed_table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def table(self, name: str) -> DataFrame:
        if not self.has_table(name):
            raise KeyError(f"no such table: {name}")
        path = self._tables[name].path
        if path.startswith("spark_catalog:"):
            return self.spark.table(path.split(":", 1)[1])
        return self.spark.read.parquet(path)

    def load(
        self,
        name: str,
        columns: list[str] | None = None,
        rows: list[int] | None = None,
        ranges: list[tuple[int, int]] | None = None,
        idx_col: str = "idx",
    ) -> DataFrame:
        """Sparse row-subset read of a catalog table — see ``sparse_load``."""
        return sparse_load(
            self.table(name), columns=columns, rows=rows, ranges=ranges, idx_col=idx_col
        )

    def stream(self, name: str, stream_col: str | None = None, order_col: str | None = None) -> DataFrame:
        """Open a table as a stream (materializes dense ``idx`` if absent)."""
        df = self.table(name)
        if S.IDX_COL in df.columns and (stream_col is None or stream_col == S.STREAM_COL):
            if S.STREAM_COL not in df.columns:
                return S.make_stream(df, None, order_col)
            return df
        return S.make_stream(df, stream_col, order_col)

    def delete_table(self, name: str) -> None:
        if not self.has_table(name):
            raise KeyError(f"no such table: {name}")
        info = self._tables.pop(name)
        self._save_catalog()
        if info.path.startswith("spark_catalog:"):
            self.spark.sql(f"DROP TABLE IF EXISTS {info.path.split(':', 1)[1]}")
            return
        # data files removed lazily / by vacuum; catalog removal is the commit
        import shutil

        shutil.rmtree(info.path, ignore_errors=True)

    def summarize(self) -> str:
        lines = [f"Database at {self.db_path}: {len(self._tables)} table(s)"]
        for t in sorted(self._tables.values(), key=lambda t: t.name):
            lines.append(f"  {t.name}: columns={t.columns} committed={t.committed}")
        return "\n".join(lines)
