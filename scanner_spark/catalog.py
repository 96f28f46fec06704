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
