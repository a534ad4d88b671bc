"""Arrow IPC source/sink (sources/ipc.py): round trip, record-batch
streaming, zero-copy column pruning, deterministic shard layout,
atomic writes."""

import os

import pyarrow as pa
import pyarrow.ipc
import ray.data

from readability_ray.sources import read_ipc, write_ipc_shards


def _docs(n=100):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array([f"doc {i} body " * (i % 5 + 1)
                          for i in range(n)]),
        "lang": pa.array(["en", "de"][i % 2] for i in range(n))}))


def test_ipc_roundtrip_values(ray_session, tmp_path):
    ds = _docs(100)
    man = write_ipc_shards(ds, str(tmp_path), rows_per_shard=30,
                           batch_rows=8).to_pandas()
    assert man["n_records"].sum() == 100
    assert all(p.endswith(".arrow") for p in man["shard_path"])
    assert not any(p.endswith(".tmp")
                   for p in os.listdir(tmp_path))
    back = read_ipc(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    orig = ds.to_pandas()
    assert back.equals(orig)


def test_ipc_multi_batch_streaming_and_pruning(ray_session, tmp_path):
    """A shard written with batch_rows=8 really contains many record
    batches (the reader's streaming granularity), and column pruning
    returns only the requested columns."""
    ds = _docs(100).repartition(1)
    write_ipc_shards(ds, str(tmp_path), rows_per_shard=100,
                     batch_rows=8).materialize()
    files = [f for f in os.listdir(tmp_path) if f.endswith(".arrow")]
    assert len(files) == 1
    with pa.OSFile(os.path.join(str(tmp_path), files[0])) as f:
        reader = pa.ipc.open_file(f)
        assert reader.num_record_batches > 10
    back = read_ipc(str(tmp_path), columns=["doc_id"])
    df = back.to_pandas()
    assert list(df.columns) == ["doc_id"]
    assert sorted(df["doc_id"]) == list(range(100))


def test_ipc_shard_names_content_derived(ray_session, tmp_path):
    """Same data, same batch boundaries -> same shard names."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ds = _docs(60).repartition(2)
    write_ipc_shards(ds, a, rows_per_shard=30).materialize()
    write_ipc_shards(ds, b, rows_per_shard=30).materialize()
    assert sorted(os.listdir(a)) == sorted(os.listdir(b))


def test_ipc_reads_pandas_feather_files(ray_session, tmp_path):
    """Interop: a Feather v2 file written by pandas reads in place
    (the partner-drop scenario the source exists for)."""
    import pandas as pd
    df = pd.DataFrame({"doc_id": range(50),
                       "text": [f"t{i}" for i in range(50)]})
    df.to_feather(str(tmp_path / "drop.feather"),
                  compression="uncompressed")
    back = read_ipc(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert back.equals(df)
