"""Small shared helpers for batch UDFs."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def arrow_out(df: pd.DataFrame) -> pa.Table:
    """pandas → Arrow with the ``pandas`` schema-metadata blob stripped.

    Ray Data dedupes block schemas via ``hash(schema)``; the metadata
    pyarrow attaches for pandas round-trips contains a dict, which makes
    the schema unhashable — every such block logs "Failed to hash the
    schemas" and forces the expensive unify path.  All pandas-format
    stages should return through this instead of returning the frame.
    """
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def strip_schema_metadata(ds):
    """Zero-copy removal of schema metadata from every block.

    Parquet files written via pandas embed a ``pandas`` metadata blob;
    blocks read from them carry it into shuffle aggregators, where
    Ray's ``hash(schema)`` dedup fails on the embedded dict (warning
    noise + always taking the expensive schema-unify path).  Run shuffle
    inputs through this first.
    """
    import pyarrow as pa

    def _strip(batch: pa.Table) -> pa.Table:
        if batch.schema.metadata:
            return batch.replace_schema_metadata(None)
        return batch

    return ds.map_batches(_strip, batch_format="pyarrow",
                          zero_copy_batch=True)
