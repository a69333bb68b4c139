import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_export_jsonl_partitioned_roundtrip_and_resume(tmp_path):
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from raycrawl.io_sinks import export_jsonl_partitioned, read_back_jsonl

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    out = str(tmp_path / "exp")
    written = export_jsonl_partitioned(ds, out, "lang")
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"]).to_pandas()
    assert written == src.groupby("lang").size().to_dict()
    back = read_back_jsonl(out).to_pandas()
    assert sorted(back.doc_id) == sorted(src.doc_id)
    a = back.sort_values("doc_id").reset_index(drop=True)
    b = src.sort_values("doc_id").reset_index(drop=True)
    assert (a[["doc_id", "lang", "n_chars"]].values == b.values).all()
    # resume: mutate one partition's data file, re-export — committed
    # partitions are skipped, so the mutation survives
    lang0 = sorted(written)[0]
    pdir = os.path.join(out, f"lang={lang0}")
    fn = [f for f in os.listdir(pdir) if f.endswith(".json")][0]
    with open(os.path.join(pdir, fn), "a") as f:
        pass  # touch
    mtime0 = os.path.getmtime(os.path.join(pdir, fn))
    export_jsonl_partitioned(ds, out, "lang")
    assert os.path.getmtime(os.path.join(pdir, fn)) == mtime0
