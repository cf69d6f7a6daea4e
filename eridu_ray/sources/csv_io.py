"""CSV source/sink operators (SURVEY.md §2 S3/S8/S9).

The reference ingests its corpus as gzipped CSV and converts it to
Parquet in the driver (eridu/cli/main.py:134-147,
``pd.read_csv(compression="gzip")`` → ``to_parquet``) and exports
categorized evaluation results as CSV
(eridu/etl/checks_evaluation.py:310-334, cluster results read back at
eridu/etl/cluster_split.py:30).  Here the same operators are Ray-Data
distributed: ``ray.data.read_csv`` (file-parallel, gzip via Arrow's
stream decompression) and ``Dataset.write_csv`` — the driver never holds
the table.

Correctness gate: the queries() entries round-trip tables through CSV
and compare against DuckDB oracles reading the original Parquet — any
quoting/typing infidelity in the CSV path breaks the value hash.
"""

from __future__ import annotations

import gzip
import os

import pyarrow as pa
import pyarrow.csv as pacsv

from eridu_ray.kernels.numeric import round_half_away as _round_half_away


def read_csv(path: str, gzipped: bool = False):
    """S8: distributed CSV reader (gzip-aware)."""
    import ray.data as rd

    if gzipped:
        return rd.read_csv(
            path, arrow_open_stream_args={"compression": "gzip"})
    return rd.read_csv(path)


def write_csv(ds, out_dir: str):
    """S9: distributed CSV writer (one file per block; never coalesce(1)
    at scale — SURVEY.md §4 output-layout row)."""
    ds.write_csv(out_dir)
    return out_dir


def gzip_csv_to_parquet(csv_gz_path: str, out_dir: str):
    """S3: gzipped-CSV → Parquet conversion, distributed.

    The reference's driver-memory pandas conversion
    (eridu/cli/main.py:134-147) becomes read_csv → write_parquet: the
    gz members decompress in workers and Parquet comes out partitioned.
    """
    ds = read_csv(csv_gz_path, gzipped=True)
    ds.write_parquet(out_dir)
    return out_dir


def write_gzip_csv_fixture(table: pa.Table, path: str) -> str:
    """Deterministic gz-CSV fixture writer (driver-side, test/fixture
    only — the engine's own sink is :func:`write_csv`)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with gzip.GzipFile(tmp, "wb", mtime=0) as f:
        pacsv.write_csv(table, f)
    os.replace(tmp, path)
    return path


# --- queries() entries ----------------------------------------------------

def q_csv_roundtrip(sf_dir: str):
    """S8+S9 gate: documents subset → write_csv → read_csv → rows.

    The oracle reads the same subset straight from Parquet, so the CSV
    writer/reader pair must preserve every value (ints and strings with
    commas/quotes) exactly to hash-match.
    """
    import ray.data as rd

    out_dir = f"/tmp/eridu_csv/roundtrip-{os.path.basename(os.path.normpath(sf_dir))}"
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source", "n_chars",
                                  "text"])
    import shutil

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    write_csv(ds, out_dir)
    return read_csv(out_dir)


def q_gzcsv_to_parquet(sf_dir: str):
    """S3 gate: gz-CSV (events subset fixture) → Parquet → rows."""
    import ray.data as rd

    import numpy as np

    tag = os.path.basename(os.path.normpath(sf_dir))
    root = f"/tmp/eridu_csv/gz-{tag}"
    gz = os.path.join(root, "events.csv.gz")
    pq_dir = os.path.join(root, "parquet")
    if not os.path.exists(gz):
        # fixture: integer cents (CSV float formatting is not obliged to
        # round-trip doubles bit-exactly; ints are)
        src = rd.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["event_id", "event_type", "value"])

        def cents(b: pa.Table) -> pa.Table:
            c = _round_half_away(b["value"].to_numpy(zero_copy_only=False) * 100
                        ).astype("int64")
            return pa.table({"event_id": b["event_id"],
                             "event_type": b["event_type"],
                             "cents": pa.array(c)})

        tab = pa.concat_tables(
            b for b in src.map_batches(cents, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=65536))
        write_gzip_csv_fixture(tab, gz)
    import shutil

    if os.path.exists(pq_dir):
        shutil.rmtree(pq_dir)
    gzip_csv_to_parquet(gz, pq_dir)
    return rd.read_parquet(pq_dir)


def q_csv_io(sf_dir: str):
    """Merged registry entry (S3+S8+S9 in ONE driver row — the same
    50-query-window consolidation pattern as ``text_dedup_pairs``): the
    CSV write→read round-trip over documents and the gz-CSV→Parquet
    conversion over events both execute, projected to one tagged
    (part, rid, cat, num, txt) schema.  Every value of both subsets
    still reaches the hash (lang/source survive concatenated), so any
    quoting/typing infidelity in either path breaks the oracle match.
    """
    import pyarrow.compute as pc

    def proj_docs(b: pa.Table) -> pa.Table:
        cat = pc.binary_join_element_wise(
            pc.cast(b["lang"], pa.string()),
            pc.cast(b["source"], pa.string()), "/")
        return pa.table({
            "part": pa.array(["csv"] * b.num_rows, pa.string()),
            "rid": pc.cast(b["doc_id"], pa.int64()),
            "cat": cat,
            "num": pc.cast(b["n_chars"], pa.int64()),
            "txt": pc.cast(b["text"], pa.string())})

    def proj_events(b: pa.Table) -> pa.Table:
        return pa.table({
            "part": pa.array(["gz"] * b.num_rows, pa.string()),
            "rid": pc.cast(b["event_id"], pa.int64()),
            "cat": pc.cast(b["event_type"], pa.string()),
            "num": pc.cast(b["cents"], pa.int64()),
            "txt": pa.array([""] * b.num_rows, pa.string())})

    docs = q_csv_roundtrip(sf_dir).map_batches(
        proj_docs, batch_format="pyarrow")
    events = q_gzcsv_to_parquet(sf_dir).map_batches(
        proj_events, batch_format="pyarrow")
    return docs.union(events)


ORACLE_SQL: dict[str, str] = {
    # round-trips must reproduce the Parquet-read subsets exactly
    "csv_io_roundtrip": (
        "SELECT 'csv' AS part, doc_id AS rid, "
        "lang || '/' || source AS cat, n_chars AS num, text AS txt "
        "FROM documents "
        "UNION ALL "
        "SELECT 'gz' AS part, event_id AS rid, event_type AS cat, "
        "CAST(round(value * 100) AS BIGINT) AS num, '' AS txt "
        "FROM events"),
}
