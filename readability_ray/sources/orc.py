"""ORC interchange — the fourth corpus-native columnar/archive format
beside Parquet, CSV/JSONL and WARC/WET (Hive/Spark lakes ship ORC;
an engine claiming drop-in corpus ingest must read it in place).

Ray 2.49 has no built-in ``read_orc``, so the source is a
``FileBasedDatasource`` whose per-file read task iterates the file's
STRIPES — ORC's natural block granularity (each stripe is an
independent, internally-indexed row group, typically 64 MB) — and
emits one Arrow table per stripe, so a 100-TB lake streams through
the object store stripe-by-stripe with column pruning pushed into the
ORC reader (never whole-file materialization).  ORC needs random
access (the footer lives at the end), so the datasource overrides
``_open_input_source`` to open a seekable file instead of the default
sequential stream.

The sink mirrors ``write_warc_shards``: one ``.orc`` shard per batch,
content-derived deterministic names, atomic tmp→rename (a re-run
overwrites, never interleaves), manifest rows back.  New-engine
surface; no reference counterpart (the reference has no columnar IO —
cli.js reads single HTML files).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.orc


try:  # import-gated so pure-parser users don't need ray
    from ray.data.datasource import FileBasedDatasource

    class OrcDatasource(FileBasedDatasource):
        """Stripe-streaming ORC reader: one read task per file, one
        Arrow block per stripe, column pruning pushed down."""

        _FILE_EXTENSIONS = ["orc"]

        def __init__(self, paths, columns: list[str] | None = None,
                     **kwargs):
            kwargs.setdefault("file_extensions",
                              self._FILE_EXTENSIONS)
            super().__init__(paths, **kwargs)
            self._columns = columns

        def _open_input_source(self, filesystem, path: str,
                               **open_args):
            # ORC requires a seekable file (footer-at-end layout).
            return filesystem.open_input_file(path)

        def _read_stream(self, f, path: str):
            orcf = pyarrow.orc.ORCFile(f)
            for i in range(orcf.nstripes):
                batch = orcf.read_stripe(i, columns=self._columns)
                # drop any embedded pandas metadata — it makes block
                # schemas unhashable downstream (CLAUDE.md gotcha)
                yield pa.Table.from_batches([batch]) \
                    .replace_schema_metadata(None)

    def read_orc(paths, columns: list[str] | None = None, **kwargs):
        """``ray.data.read_parquet``-alike for ORC files/dirs."""
        import ray.data
        return ray.data.read_datasource(
            OrcDatasource(paths, columns=columns), **kwargs)

except ImportError:  # pragma: no cover
    def read_orc(*a, **k):  # type: ignore
        raise ImportError("ray is required for read_orc")


def write_orc_shards(ds, out_dir: str, *,
                     rows_per_shard: int = 4096,
                     stripe_size: int = 8 * 1024 * 1024):
    """Distributed ORC sink: one ``map_batches`` pass, one ``.orc``
    shard per batch, atomic tmp→rename.  Shard names derive from the
    batch content (md5 of the first column's values) so the layout is
    deterministic given the same batch boundaries.  Returns the
    manifest as a Dataset: (shard_path, n_records, n_bytes).
    """
    os.makedirs(out_dir, exist_ok=True)

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
            out_dir, f"part-{name}-{batch.num_rows}.orc")
        tmp = path + ".tmp"
        pyarrow.orc.write_table(batch, tmp,
                                stripe_size=stripe_size)
        os.replace(tmp, path)
        n_bytes = os.path.getsize(path)
        return pa.table({
            "shard_path": pa.array([path], pa.string()),
            "n_records": pa.array([batch.num_rows], pa.int64()),
            "n_bytes": pa.array([n_bytes], pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow",
                          batch_size=rows_per_shard)
