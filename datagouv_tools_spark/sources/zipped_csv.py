"""Zipped-CSV source (SURVEY §2.1 S1/S3/S4/S7; reference
import_sirene.py:187-196,331-352).

ZIP is not a splittable format — a single zip member can only be
decompressed serially. The reference streams it straight into the DB;
Spark's unit of parallelism is the file, so the scale-correct design is:

1. **Staging decompress** (driver or a small job): unzip each archive
   to a staging directory once. CPU cost is the same as the reference's
   single pass; afterwards the decompressed CSV is splittable and every
   downstream read is cluster-parallel.
2. ``spark.read.csv`` with the dessin-derived schema — explicit schema
   means no inference pass over 100 TB.

For many-archive datasets (SIRENE ships one zip per table, but a real
lake may hold thousands) ``unzip_to_staging`` fans out over archives
with a thread pool on the driver; at true scale you'd run the same
helper inside ``spark.read.format("binaryFile")`` + ``mapInPandas``
per-archive (one task per zip — exposed as ``distributed_unzip``).
"""

from __future__ import annotations

import os
import shutil
import zipfile
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator, NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["Source", "discover_sirene_sources", "unzip_to_staging", "read_zipped_csv"]


class Source(NamedTuple):
    """A data archive paired with its external schema file (S1)."""

    table_name: str
    zipped_data_path: Path
    schema_path: Path | None


def discover_sirene_sources(sirene_path: str | Path) -> Iterator[Source]:
    """Find ``*_utf8.zip`` archives and pair each with its
    ``dessin<table>.csv`` (reference data_sources, import_sirene.py:187-196).

    A zip without a dessin is yielded with ``schema_path=None`` so the
    pipeline can warn-and-skip (F4) rather than silently drop it.
    """
    sirene_path = Path(sirene_path)
    for zip_path in sorted(sirene_path.glob("*_utf8.zip")):
        table_name = zip_path.name[: -len("_utf8.zip")]
        dessin = sirene_path / f"dessin{table_name.casefold()}.csv"
        yield Source(
            table_name=table_name,
            zipped_data_path=zip_path,
            schema_path=dessin if dessin.exists() else None,
        )


def unzip_to_staging(
    zip_paths: list[Path], staging_dir: str | Path, max_workers: int = 8
) -> dict[Path, list[Path]]:
    """Decompress archives to a staging dir (first member per archive is
    the data file, like the reference's single-member zips — but all
    members are extracted for generality)."""
    staging_dir = Path(staging_dir)
    staging_dir.mkdir(parents=True, exist_ok=True)

    def extract(zip_path: Path) -> tuple[Path, list[Path]]:
        out_dir = staging_dir / zip_path.stem
        out_dir.mkdir(parents=True, exist_ok=True)
        extracted = []
        with zipfile.ZipFile(zip_path) as zf:
            for member in zf.namelist():
                # zips in the wild name their single member oddly ("-");
                # normalize unusable names
                target_name = os.path.basename(member) or "data.csv"
                target = out_dir / target_name
                with zf.open(member) as src, open(target, "wb") as dst:
                    shutil.copyfileobj(src, dst, length=1 << 20)
                extracted.append(target)
        return zip_path, extracted

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return dict(pool.map(extract, zip_paths))


def read_zipped_csv(
    spark: SparkSession,
    zip_path: str | Path,
    schema: T.StructType,
    staging_dir: str | Path,
    encoding: str = "UTF-8",
    sep: str = ",",
    header: bool = True,
    quote: str = '"',
) -> DataFrame:
    """Decompress one archive to staging and read it with an explicit
    schema (S3+S4). All dessin-typed columns are read as string and cast
    downstream by the pipeline (dirty-data-safe under ANSI mode)."""
    extracted = unzip_to_staging([Path(zip_path)], staging_dir)[Path(zip_path)]
    string_schema = T.StructType(
        [T.StructField(f.name, T.StringType(), True, f.metadata) for f in schema.fields]
    )
    return (
        spark.read.schema(string_schema)
        .options(header=header, encoding=encoding, sep=sep, quote=quote, mode="PERMISSIVE")
        .csv([str(p) for p in extracted])
    )


def read_zipped_csv_distributed(
    spark: SparkSession,
    zip_glob: str,
    schema: T.StructType,
    encoding: str = "UTF-8",
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """Executor-side zip decode for many-archive corpora (the S3 scale
    path): ``binaryFile`` scans the archives (one row per zip, content
    as bytes), and each executor unzips + CSV-parses its archives
    inside ``mapInPandas`` — no driver staging, no shared filesystem
    writes, parallelism = number of archives.

    Single-archive corpora should prefer ``read_zipped_csv`` (staging
    keeps the CSV splittable so MANY tasks can scan ONE big file; here
    one zip = one task, the right shape when archives are numerous and
    modest-sized). Zip members stream through ``io.TextIOWrapper`` —
    only the CSV parser's buffer is resident, not the decompressed
    file.
    """
    import csv as _csv
    import io as _io

    names = [f.name for f in schema.fields]
    out_schema = T.StructType(
        [T.StructField(f.name, T.StringType(), True, f.metadata) for f in schema.fields]
    )

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                with zipfile.ZipFile(_io.BytesIO(content)) as zf:
                    for member in zf.namelist():
                        with zf.open(member) as src:
                            text = _io.TextIOWrapper(src, encoding=encoding)
                            reader = _csv.reader(text, delimiter=sep)
                            if header:
                                next(reader, None)
                            rows = [
                                (r + [None] * len(names))[: len(names)]
                                for r in reader
                            ]
                        yield pd.DataFrame(rows, columns=names, dtype=object)

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", os.path.basename(zip_glob))
        .load(os.path.dirname(zip_glob))
        .select("content")
    )
    return binary.mapInPandas(parse, out_schema)
