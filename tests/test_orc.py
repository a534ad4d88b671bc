"""ORC source/sink (sources/orc.py): round trip, stripe streaming,
column pruning, deterministic shard layout, atomic writes."""

import os

import pyarrow as pa
import pyarrow.orc
import ray.data

from readability_ray.sources import read_orc, write_orc_shards


def _docs(n=100):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array([f"doc {i} body " * (i % 5 + 1)
                          for i in range(n)]),
        "lang": pa.array(["en", "de"][i % 2] for i in range(n))}))


def test_orc_roundtrip_values(ray_session, tmp_path):
    ds = _docs(100)
    man = write_orc_shards(ds, str(tmp_path), rows_per_shard=30) \
        .to_pandas()
    assert man["n_records"].sum() == 100
    assert all(p.endswith(".orc") for p in man["shard_path"])
    assert not any(p.endswith(".tmp")
                   for p in os.listdir(tmp_path))
    back = read_orc(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    orig = ds.to_pandas()
    assert back.equals(orig)


def test_orc_column_pruning_and_stripes(ray_session, tmp_path):
    """Column pruning returns only requested columns; a file with
    several stripes streams stripe-by-stripe and loses nothing."""
    path = str(tmp_path / "multi.orc")
    n = 5000  # the writer chunks internally ~1024 rows per stripe
    # boundary decision, so a multi-stripe file needs a few thousand
    with pyarrow.orc.ORCWriter(path, stripe_size=1024) as w:
        w.write(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"doc {i} body" for i in range(n)]),
            "lang": pa.array(["en"] * n)}))
    of = pyarrow.orc.ORCFile(path)
    assert of.nstripes > 1
    back = read_orc(str(tmp_path), columns=["doc_id"])
    df = back.to_pandas()
    assert list(df.columns) == ["doc_id"]
    assert sorted(df["doc_id"]) == list(range(n))


def test_orc_shard_names_content_derived(ray_session, tmp_path):
    """Same data, same batch boundaries -> same shard names."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ds = _docs(60).repartition(2)
    write_orc_shards(ds, a, rows_per_shard=30).materialize()
    write_orc_shards(ds, b, rows_per_shard=30).materialize()
    assert sorted(os.listdir(a)) == sorted(os.listdir(b))
