"""Resumable extraction: partition layout, lineage manifests, skip of
completed shards, recovery from partial output."""

import json
import os

import pyarrow.parquet as pq


def _make_shards(tmp_path, n_shards=3, pages_per_shard=40):
    from readability_ray.sources import write_pages_parquet
    files = []
    for i in range(n_shards):
        path = str(tmp_path / f"shard{i}.parquet")
        write_pages_parquet(path, pages_per_shard, seed=100 + i)
        files.append(path)
    return files


def test_resumable_extraction(ray_session, tmp_path):
    from readability_ray.pipelines.resume import (
        completed_shards, run_resumable_extraction)
    files = _make_shards(tmp_path)
    out_dir = str(tmp_path / "out")

    summary = run_resumable_extraction(files, out_dir, concurrency=(1, 2),
                                       batch_size=32)
    assert summary["processed"] == ["shard0", "shard1", "shard2"]
    assert summary["skipped"] == []
    assert summary["total_rows"] == 120

    manifests = completed_shards(out_dir)
    assert set(manifests) == {"shard0", "shard1", "shard2"}
    m = manifests["shard0"]
    assert m["rows"] == 40
    assert m["errors"] == 0
    assert "article" in m["page_types"]
    assert m["wall_time_sec"] > 0

    # output is readable parquet per shard
    table = pq.read_table(os.path.join(out_dir, "shard=shard1"))
    assert table.num_rows == 40

    # second run skips everything
    summary2 = run_resumable_extraction(files, out_dir, concurrency=(1, 2))
    assert summary2["processed"] == []
    assert set(summary2["skipped"]) == {"shard0", "shard1", "shard2"}


def test_resume_recovers_incomplete_shard(ray_session, tmp_path):
    from readability_ray.pipelines.resume import (
        MANIFEST_NAME, completed_shards, run_resumable_extraction)
    files = _make_shards(tmp_path, n_shards=2, pages_per_shard=20)
    out_dir = str(tmp_path / "out")
    run_resumable_extraction(files, out_dir, concurrency=(1, 2))

    # simulate a crash: remove shard1's manifest (incomplete output)
    os.remove(os.path.join(out_dir, "shard=shard1", MANIFEST_NAME))
    assert set(completed_shards(out_dir)) == {"shard0"}

    summary = run_resumable_extraction(files, out_dir, concurrency=(1, 2))
    assert summary["processed"] == ["shard1"]
    assert summary["skipped"] == ["shard0"]
    assert set(completed_shards(out_dir)) == {"shard0", "shard1"}


def test_resume_zero_row_shard(ray_session, tmp_path):
    """A shard whose pipeline yields zero rows still commits a manifest
    (rows=0) and is skipped on rerun — the stats re-read must not choke
    on a part-less shard dir."""
    import pyarrow as pa

    from readability_ray.pipelines.resume import (
        completed_shards, run_resumable_extraction)
    empty = str(tmp_path / "empty.parquet")
    pq.write_table(pa.table({"url": pa.array([], pa.string()),
                             "html": pa.array([], pa.string())}), empty)
    out_dir = str(tmp_path / "out_empty")
    summary = run_resumable_extraction([empty], out_dir,
                                       concurrency=(1, 2))
    assert summary["processed"] == ["empty"]
    assert summary["total_rows"] == 0
    manifests = completed_shards(out_dir)
    assert manifests["empty"]["rows"] == 0
    assert manifests["empty"]["errors"] == 0

    summary2 = run_resumable_extraction([empty], out_dir,
                                        concurrency=(1, 2))
    assert summary2["skipped"] == ["empty"]


def test_resume_concurrent_shards(ray_session, tmp_path):
    """shard_parallelism > 1 submits shard pipelines concurrently and
    produces the same manifests/layout as the serial path."""
    from readability_ray.pipelines.resume import (
        completed_shards, run_resumable_extraction)
    files = _make_shards(tmp_path, n_shards=3, pages_per_shard=15)
    out_dir = str(tmp_path / "out_par")
    summary = run_resumable_extraction(files, out_dir, concurrency=(1, 2),
                                       batch_size=16, shard_parallelism=3)
    assert summary["processed"] == ["shard0", "shard1", "shard2"]
    assert summary["total_rows"] == 45
    manifests = completed_shards(out_dir)
    assert all(manifests[s]["rows"] == 15 for s in manifests)


def test_extract_job_entrypoint(ray_session, tmp_path, capsys):
    """tools/extract_job.py — the `ray job submit` entrypoint: runs the
    resumable pipeline over a shard dir, prints one JSON metrics line,
    exits 0, and a resubmit skips every completed shard."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.extract_job import main
    files = _make_shards(tmp_path, n_shards=2, pages_per_shard=10)
    in_dir = os.path.dirname(files[0])
    out_dir = str(tmp_path / "job_out")

    rc = main(["--input", in_dir, "--output", out_dir,
               "--batch-size", "16", "--shard-parallelism", "1"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(line)
    assert rc == 0
    assert metrics["pages"] == 20
    assert sorted(metrics["processed"]) == ["shard0", "shard1"]
    assert metrics["skipped"] == []
    assert metrics["errors"] == 0
    assert metrics["pages_per_sec"] > 0

    rc2 = main(["--input", in_dir, "--output", out_dir])
    metrics2 = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert rc2 == 0
    assert metrics2["processed"] == []
    assert sorted(metrics2["skipped"]) == ["shard0", "shard1"]
    assert metrics2["pages"] == 20


def test_resume_wet_twin(ray_session, tmp_path):
    """wet=True publishes each shard's markdown as WET conversion
    records in the parallel _wet tree; resume leaves them intact."""
    from readability_ray.pipelines.resume import (
        completed_shards, run_resumable_extraction)
    from readability_ray.sources.warc import read_warc

    files = _make_shards(tmp_path, n_shards=2, pages_per_shard=20)
    out_dir = str(tmp_path / "out")
    run_resumable_extraction(files, out_dir, concurrency=(1, 2),
                             batch_size=32, wet=True)
    manifests = completed_shards(out_dir)
    assert all(m["wet_dir"] for m in manifests.values())

    for shard, m in manifests.items():
        wet = read_warc(m["wet_dir"]).to_pandas()
        pq_df = __import__("ray").data.read_parquet(
            os.path.join(out_dir, f"shard={shard}"),
            columns=["url", "markdown"]).to_pandas()
        assert len(wet) == len(pq_df) == 20
        got = {u: h.decode() for u, h in zip(wet["url"], wet["html"])}
        want = dict(zip(pq_df["url"], pq_df["markdown"]))
        assert got == want

    # the _wet tree must not confuse shard discovery; resume skips all
    summary = run_resumable_extraction(files, out_dir, wet=True)
    assert summary["processed"] == []
    assert sorted(summary["skipped"]) == ["shard0", "shard1"]


def test_chaos_worker_sigkill_mid_shard(ray_session, tmp_path):
    """Round-3 verdict #10: REAL task failure.  A map worker is
    SIGKILLed mid-shard (first execution only — a flag file arms the
    kill exactly once); Ray's task retry must rerun the lost block and
    the pipeline must complete with every row intact."""
    import os as _os
    import signal

    import pyarrow as pa
    import ray.data

    from readability_ray.pipelines import extract_pipeline
    from readability_ray.sources import generate_pages

    flag = str(tmp_path / "killed_once")

    def kill_once(batch: pa.Table) -> pa.Table:
        if not _os.path.exists(flag):
            with open(flag, "w") as f:
                f.write("armed")
            _os.kill(_os.getpid(), signal.SIGKILL)  # die mid-shard
        return batch

    pages = generate_pages(40, seed=7)
    ds = ray.data.from_arrow(pages).select_columns(["url", "html"]) \
        .map_batches(kill_once, batch_format="pyarrow", batch_size=10)
    out = extract_pipeline(ds, use_actors=False,
                           batch_size=10).to_pandas()
    assert _os.path.exists(flag), "the chaos kill never fired"
    assert len(out) == 40
    assert set(out["url"]) == set(pages.column("url").to_pylist())


def test_chaos_sigkill_leftover_tmp_reprocessed_exactly(ray_session,
                                                        tmp_path):
    """A SIGKILLed run leaves shard=X.tmp (no manifest).  The rerun's
    manifest anti-join must reprocess exactly the missing shard —
    clearing the stale tmp — and leave completed shards untouched."""
    from readability_ray.pipelines.resume import (
        MANIFEST_NAME, completed_shards, run_resumable_extraction)
    files = _make_shards(tmp_path, n_shards=3, pages_per_shard=20)
    out_dir = str(tmp_path / "out")
    run_resumable_extraction(files, out_dir, concurrency=(1, 2))

    # simulate the kill: shard2 loses its manifest AND has a stale
    # half-written tmp dir from the dying writer
    import shutil
    shard2 = os.path.join(out_dir, "shard=shard2")
    tmp2 = shard2 + ".tmp"
    shutil.move(shard2, tmp2)
    os.remove(os.path.join(tmp2, MANIFEST_NAME))
    with open(os.path.join(tmp2, "part-junk.parquet"), "wb") as f:
        f.write(b"half a row group")  # torn write
    before = {
        s: json.load(open(os.path.join(out_dir, f"shard={s}",
                                       MANIFEST_NAME)))["completed_at"]
        for s in ("shard0", "shard1")}

    summary = run_resumable_extraction(files, out_dir, concurrency=(1, 2))
    assert summary["processed"] == ["shard2"]
    assert set(summary["skipped"]) == {"shard0", "shard1"}
    assert not os.path.isdir(tmp2), "stale tmp must be cleared"
    assert set(completed_shards(out_dir)) == {"shard0", "shard1",
                                              "shard2"}
    # untouched shards really untouched (manifest timestamps stable)
    for s, ts in before.items():
        m = json.load(open(os.path.join(out_dir, f"shard={s}",
                                        MANIFEST_NAME)))
        assert m["completed_at"] == ts
    table = pq.read_table(os.path.join(out_dir, "shard=shard2"))
    assert table.num_rows == 20
