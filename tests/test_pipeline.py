"""Composed flagship pipeline (VERDICT r3 next-round 5): dedup apply +
quality filter + reproducible shuffle compose into one oracled table, and
the export leg survives a mid-run kill (resume completes exactly the
missing shards, no double-count)."""

import os

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con.execute(sql).df()


@pytest.mark.usefixtures("ray_session")
def test_training_corpus_matches_oracle_order_sensitive():
    from raycrawl.pipeline import training_corpus, training_corpus_sql

    got = training_corpus(SF).to_pandas()
    ora = _oracle(training_corpus_sql())
    n_docs = _oracle("SELECT count(*) AS n FROM documents")["n"].iloc[0]
    assert len(got) > 0, "quality cutoff removed the whole tiny corpus"
    assert len(got) < n_docs, "nothing was filtered — composition is a no-op"
    ora = ora.astype({c: got[c].dtype for c in got.columns})
    assert got.equals(ora[got.columns])


@pytest.mark.usefixtures("ray_session")
def test_training_pipeline_export_kill_resume(tmp_path):
    """Kill-and-resume on the composed export: run it, destroy one shard's
    commit (stale file, no marker) and delete another entirely, re-run,
    and the read-back must equal the oracled surviving set exactly."""
    from raycrawl.io_sinks import read_back_jsonl
    from raycrawl.pipeline import run_training_pipeline, training_corpus_sql

    out = str(tmp_path / "corpus")
    written = run_training_pipeline(SF, out, num_shards=4)

    ora = _oracle(training_corpus_sql())
    assert written == ora.groupby("lang").size().to_dict()

    # simulated crash: one partition loses a shard file + marker entirely,
    # another keeps a stale (appended-to) file with its marker removed
    pdirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert len(pdirs) >= 2
    p0 = os.path.join(out, pdirs[0])
    fn0 = sorted(f for f in os.listdir(p0) if f.endswith(".jsonl"))[0]
    s0 = int(fn0.split("-")[1].split(".")[0])
    os.remove(os.path.join(p0, fn0))
    os.remove(os.path.join(p0, f"_OK.{s0}"))
    if os.path.exists(os.path.join(p0, "_SUCCESS")):
        os.remove(os.path.join(p0, "_SUCCESS"))
    p1 = os.path.join(out, pdirs[1])
    fn1 = sorted(f for f in os.listdir(p1) if f.endswith(".jsonl"))[0]
    s1 = int(fn1.split("-")[1].split(".")[0])
    with open(os.path.join(p1, fn1), "a") as f:
        f.write('{"doc_id": -999, "lang": "zz", "text": "x", '
                '"quality": 0.0, "shuffle_key": 0}\n')
    os.remove(os.path.join(p1, f"_OK.{s1}"))
    if os.path.exists(os.path.join(p1, "_SUCCESS")):
        os.remove(os.path.join(p1, "_SUCCESS"))

    written2 = run_training_pipeline(SF, out, num_shards=4)
    assert written2 == written

    back = read_back_jsonl(out).to_pandas()
    assert sorted(back.doc_id) == sorted(ora.doc_id)  # no dup, no -999
    a = back.sort_values("doc_id").reset_index(drop=True)
    b = ora.sort_values("doc_id").reset_index(drop=True)
    assert (a["lang"].values == b["lang"].values).all()
    assert (a["shuffle_key"].values == b["shuffle_key"].values).all()
    assert (a["quality"].values == b["quality"].values).all()
    assert (a["text"].str.len().values > 0).all()
