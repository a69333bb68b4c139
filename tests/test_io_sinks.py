import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("compression", [None, "zstd", "gzip"])
def test_export_jsonl_partitioned_roundtrip_and_resume(tmp_path, compression):
    import json
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from raycrawl.io_sinks import export_jsonl_partitioned, read_back_jsonl

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    out = str(tmp_path / "exp")
    written = export_jsonl_partitioned(ds, out, "lang", num_shards=4,
                                       compression=compression)
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"]).to_pandas()
    assert written == src.groupby("lang").size().to_dict()
    back = read_back_jsonl(out).to_pandas()
    assert sorted(back.doc_id) == sorted(src.doc_id)
    a = back.sort_values("doc_id").reset_index(drop=True)
    b = src.sort_values("doc_id").reset_index(drop=True)
    assert (a[["doc_id", "lang", "n_chars"]].values == b.values).all()
    # resume: committed shards are skipped, so their files are untouched
    lang0 = sorted(written)[0]
    pdir = os.path.join(out, f"lang={lang0}")
    ext = {None: ".jsonl", "zstd": ".jsonl.zst", "gzip": ".jsonl.gz"}[compression]
    fns = sorted(f for f in os.listdir(pdir)
                 if f.startswith("part-") and f.endswith(ext))
    assert fns, "expected committed shard files"
    mtime0 = os.path.getmtime(os.path.join(pdir, fns[0]))
    written2 = export_jsonl_partitioned(ds, out, "lang", num_shards=4,
                                        compression=compression)
    assert written2 == written
    assert os.path.getmtime(os.path.join(pdir, fns[0])) == mtime0
    # marker carries the byte accounting; compressed modes must actually
    # compress (the synthetic docs are compressible text)
    shard = int(fns[0].split("-")[1].split(".")[0])
    with open(os.path.join(pdir, f"_OK.{shard}")) as f:
        mk = json.load(f)
    assert mk["compression"] == compression
    assert mk["compressed_bytes"] == os.path.getsize(os.path.join(pdir, fns[0]))
    if compression is not None:
        assert mk["compressed_bytes"] < mk["uncompressed_bytes"]


@pytest.mark.usefixtures("ray_session")
def test_export_jsonl_compressed_load_and_codec_pin(tmp_path):
    """zstd tree round-trips through the distributed source, and a resume
    with a different codec is refused (one tree, one codec)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from raycrawl.io_sinks import export_jsonl_partitioned, load_jsonl_partitioned

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    out = str(tmp_path / "exp")
    export_jsonl_partitioned(ds, out, "lang", num_shards=4, compression="zstd")
    back = load_jsonl_partitioned(out, "lang").to_pandas()
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"]).to_pandas()
    a = back.sort_values("doc_id").reset_index(drop=True)
    b = src.sort_values("doc_id").reset_index(drop=True)
    assert (a[["doc_id", "lang", "n_chars"]].values
            == b[["doc_id", "lang", "n_chars"]].values).all()
    with pytest.raises(ValueError, match="routing"):
        export_jsonl_partitioned(ds, out, "lang", num_shards=4,
                                 compression="gzip")
    with pytest.raises(ValueError, match="compression"):
        export_jsonl_partitioned(ds, str(tmp_path / "x"), "lang",
                                 compression="lz9")


@pytest.mark.usefixtures("ray_session")
def test_export_jsonl_crashed_shard_is_rewritten_not_appended(tmp_path):
    """ADVICE r3 (medium): a crashed, uncommitted shard must be fully
    re-written on resume — never appended-to / double-counted."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from raycrawl.io_sinks import export_jsonl_partitioned, read_back_jsonl

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    out = str(tmp_path / "exp")
    export_jsonl_partitioned(ds, out, "lang", num_shards=4)
    # simulate a crash that left a stale data file but no commit marker:
    # corrupt one shard's file and remove its _OK marker + _SUCCESS
    lang0 = sorted(d for d in os.listdir(out)
                   if d.startswith("lang="))[0].split("=", 1)[1]
    pdir = os.path.join(out, f"lang={lang0}")
    fn = sorted(f for f in os.listdir(pdir) if f.endswith(".jsonl"))[0]
    shard = int(fn.split("-")[1].split(".")[0])
    with open(os.path.join(pdir, fn), "a") as f:
        f.write('{"doc_id": -999, "lang": "zz", "n_chars": 0}\n')
    os.remove(os.path.join(pdir, f"_OK.{shard}"))
    os.remove(os.path.join(pdir, "_SUCCESS"))
    # also leave an orphan tmp file; it must be ignored by read-back
    with open(os.path.join(pdir, ".tmp-deadbeef"), "w") as f:
        f.write('{"doc_id": -1}\n')

    written = export_jsonl_partitioned(ds, out, "lang", num_shards=4)
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"]).to_pandas()
    assert written == src.groupby("lang").size().to_dict()
    back = read_back_jsonl(out).to_pandas()
    assert sorted(back.doc_id) == sorted(src.doc_id)  # no dup, no -999


@pytest.mark.usefixtures("ray_session")
def test_load_jsonl_partitioned_dataset_source(tmp_path):
    """The distributed read path: export → ray.data source → original
    table; partition pruning via values=; uncommitted partitions hidden."""
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    from raycrawl.io_sinks import export_jsonl_partitioned, load_jsonl_partitioned

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    out = str(tmp_path / "exp")
    written = export_jsonl_partitioned(ds, out, "lang", num_shards=4)
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"]).to_pandas()

    back = load_jsonl_partitioned(out, "lang").to_pandas()
    assert set(back.columns) == {"doc_id", "lang", "n_chars"}
    a = back.sort_values("doc_id").reset_index(drop=True)
    b = src.sort_values("doc_id").reset_index(drop=True)
    assert (a[["doc_id", "lang", "n_chars"]].values
            == b[["doc_id", "lang", "n_chars"]].values).all()

    # partition-pruned claim: one value only
    langs = sorted(written)
    one = load_jsonl_partitioned(out, "lang", values=[langs[0]]).to_pandas()
    assert set(one.lang) == {langs[0]}
    assert len(one) == written[langs[0]]

    # an uncommitted partition (no _SUCCESS) is invisible to the source
    os.remove(os.path.join(out, f"lang={langs[1]}", "_SUCCESS"))
    part = load_jsonl_partitioned(out, "lang").to_pandas()
    assert set(part.lang) == set(langs) - {langs[1]}

    # no committed partitions at all → loud failure, not an empty dataset
    shutil.rmtree(out)
    os.makedirs(out)
    with pytest.raises(FileNotFoundError):
        load_jsonl_partitioned(out, "lang")


@pytest.mark.usefixtures("ray_session")
def test_export_spec_mismatch_refuses_resume(tmp_path):
    """Resuming into an out_dir written with different routing params must
    raise, not silently drop/duplicate rows against stale _OK markers
    (code-review r4: markers carried no num_shards/shard-key identity)."""
    import ray.data as rd

    from raycrawl.io_sinks import export_jsonl_partitioned

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    out = str(tmp_path / "exp")
    export_jsonl_partitioned(ds, out, "lang", num_shards=4)
    with pytest.raises(ValueError, match="routing"):
        export_jsonl_partitioned(ds, out, "lang", num_shards=8)
    with pytest.raises(ValueError, match="routing"):
        export_jsonl_partitioned(ds, out, "lang", shard_key_col="n_chars",
                                 num_shards=4)
    # identical routing still resumes cleanly
    again = export_jsonl_partitioned(ds, out, "lang", num_shards=4)
    assert sum(again.values()) == ds.count()
