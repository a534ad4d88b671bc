"""Arrow IPC (Feather v2) interchange — the wire-native columnar
format beside Parquet/CSV-JSONL/ORC/WARC.  IPC files are the zero-
serialization interchange between Arrow-native engines (Flight,
DataFusion, polars, pandas ``to_feather``); a corpus engine that
ingests partner drops must read them in place.

Ray 2.49 has no built-in ``read_ipc``/``read_feather`` for the FILE
format, so the source is a ``FileBasedDatasource`` whose per-file read
task iterates the file's RECORD BATCHES — IPC's natural block
granularity (the file footer indexes every batch, so each is an
independently addressable unit) — and emits one Arrow table per
batch: a 100-TB drop streams through the object store batch-by-batch.
Column pruning happens immediately after each batch is decoded
(``Table.select`` is zero-copy buffer slicing — IPC needs no
re-decode, unlike CSV), so only the projected columns enter the
object store.  IPC's footer lives at the end of the file, so the
datasource overrides ``_open_input_source`` to open a seekable file
(same layout constraint as ORC — sources/orc.py).

The sink mirrors ``write_orc_shards``: one ``.arrow`` shard per
batch, content-derived deterministic names, atomic tmp→rename,
manifest rows back.  New-engine surface; no reference counterpart.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.ipc


try:  # import-gated so pure-parser users don't need ray
    from ray.data.datasource import FileBasedDatasource

    class IpcDatasource(FileBasedDatasource):
        """Record-batch-streaming Arrow IPC file reader: one read task
        per file, one Arrow block per record batch, column pruning via
        zero-copy select right after decode."""

        _FILE_EXTENSIONS = ["arrow", "feather", "ipc"]

        def __init__(self, paths, columns: list[str] | None = None,
                     **kwargs):
            kwargs.setdefault("file_extensions",
                              self._FILE_EXTENSIONS)
            super().__init__(paths, **kwargs)
            self._columns = columns

        def _open_input_source(self, filesystem, path: str,
                               **open_args):
            # IPC file format is footer-indexed (random access).
            return filesystem.open_input_file(path)

        def _read_stream(self, f, path: str):
            reader = pa.ipc.open_file(f)
            for i in range(reader.num_record_batches):
                t = pa.Table.from_batches([reader.get_batch(i)])
                if self._columns is not None:
                    t = t.select(self._columns)  # zero-copy
                # drop any embedded pandas metadata — unhashable block
                # schemas force the slow unify path (CLAUDE.md gotcha)
                yield t.replace_schema_metadata(None)

    def read_ipc(paths, columns: list[str] | None = None, **kwargs):
        """``ray.data.read_parquet``-alike for Arrow IPC files."""
        import ray.data
        return ray.data.read_datasource(
            IpcDatasource(paths, columns=columns), **kwargs)

except ImportError:  # pragma: no cover
    def read_ipc(*a, **k):  # type: ignore
        raise ImportError("ray is required for read_ipc")


def write_ipc_shards(ds, out_dir: str, *,
                     rows_per_shard: int = 4096,
                     batch_rows: int = 1024):
    """Distributed Arrow IPC sink: one ``map_batches`` pass, one
    ``.arrow`` shard per batch, atomic tmp→rename (re-runs overwrite,
    never interleave).  Each shard is written as multiple record
    batches of ``batch_rows`` rows so the reader's batch-streaming
    granularity is real, not one monolithic batch.  Shard names derive
    from the batch content (md5 of the first column) so the layout is
    deterministic given the same batch boundaries.  Returns the
    manifest as a Dataset: (shard_path, n_records, n_bytes).
    """
    from ..functions.util import strip_schema_metadata

    os.makedirs(out_dir, exist_ok=True)
    ds = strip_schema_metadata(ds)  # pandas-metadata blocks are
    # unhashable for the batcher's schema dedup (CLAUDE.md gotcha)

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table({
                "shard_path": pa.array([], pa.string()),
                "n_records": pa.array([], pa.int64()),
                "n_bytes": pa.array([], pa.int64())})
        batch = batch.replace_schema_metadata(None)
        key_col = batch.column(0)
        name = hashlib.md5(
            ("\n".join(str(v) for v in key_col.to_pylist()))
            .encode()).hexdigest()[:16]
        path = os.path.join(
            out_dir, f"part-{name}-{batch.num_rows}.arrow")
        tmp = path + ".tmp"
        with pa.OSFile(tmp, "wb") as sink, \
                pa.ipc.new_file(sink, batch.schema) as writer:
            for chunk in batch.to_batches(max_chunksize=batch_rows):
                writer.write_batch(chunk)
        os.replace(tmp, path)
        n_bytes = os.path.getsize(path)
        return pa.table({
            "shard_path": pa.array([path], pa.string()),
            "n_records": pa.array([batch.num_rows], pa.int64()),
            "n_bytes": pa.array([n_bytes], pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow",
                          batch_size=rows_per_shard)
