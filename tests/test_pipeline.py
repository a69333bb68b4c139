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


@pytest.mark.usefixtures("ray_session")
def test_training_pipeline_substring_scrub_stage(tmp_path):
    """Optional substring-scrub stage, exercised on a corpus where a doc
    SHARES one 8-gram with an earlier doc without being a doc-level dup
    (so it survives dedup and must come out scrubbed): exported text is
    exactly what substring_dedup_apply certifies (md5 cross-check), the
    shared span is gone from the later doc and kept in the canonical
    one, and the stage composes with dedup + quality + export."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raycrawl.dedup import substring_dedup_apply
    from raycrawl.io_sinks import read_back_jsonl
    from raycrawl.kernels import md5_u64_arrow
    from raycrawl.pipeline import run_training_pipeline

    marker = " ".join(f"m{i}" for i in range(8))
    d0 = marker + " " + " ".join(f"a{i}" for i in range(20))
    d1 = " ".join(f"b{i}" for i in range(20)) + " " + marker + " " + \
        " ".join(f"c{i}" for i in range(10))
    d2 = " ".join(f"z{i}" for i in range(25))
    d3 = " ".join(f"w{i}" for i in range(30))      # near-dup pair so the
    d4 = d3 + " extra"                             # pair lane is non-empty
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([d0, d1, d2, d3, d4], pa.string()),
        "lang": pa.array(["en", "en", "de", "de", "de"], pa.string()),
    }), sf + "/documents.parquet")

    out = str(tmp_path / "corpus")
    run_training_pipeline(sf, out, num_shards=2, min_quality=0.0,
                          substring_k=8)
    back = read_back_jsonl(out).to_pandas().sort_values("doc_id")
    assert back.doc_id.tolist() == [0, 1, 2, 3]  # only the near-dup d4 removed
    texts = dict(zip(back.doc_id, back.text))
    assert texts[0] == d0                      # canonical copy untouched
    assert "m0" not in texts[1]                # shared span scrubbed
    assert texts[1] == d1.replace(marker + " ", "")
    assert texts[2] == d2

    cert = substring_dedup_apply(sf, k=8).to_pandas().set_index("doc_id")
    got_md5 = md5_u64_arrow(pa.array(back.text.tolist(), pa.string()))
    assert (got_md5 == cert.loc[back.doc_id, "kept_md5"].to_numpy()).all()
    assert cert.loc[1, "n_removed_words"] == 8


@pytest.mark.usefixtures("ray_session")
def test_training_pipeline_mixture_and_lm_gate_stages(tmp_path):
    """The opt-in mixture + LM gates compose: the exported doc set must be
    exactly (default-pipeline kept set) ∩ (mixture sample) ∩ (LM-ratio
    pass) — each side independently certified against its own DuckDB
    oracle elsewhere — and the carried shuffle order must be untouched."""
    from raycrawl.io_sinks import read_back_jsonl
    from raycrawl.pipeline import run_training_pipeline, training_corpus_sql
    from raycrawl.relational import documents_mixture_sample
    from raycrawl.textops import lm_familiarity_scores

    rates = {f"src{i}": (0 if i % 5 == 0 else 6000) for i in range(20)}
    ppm = 200_000  # keep docs with >= 20% known bigrams

    out = str(tmp_path / "corpus")
    run_training_pipeline(SF, out, num_shards=2, mixture_bp=rates,
                          lm_min_known_ppm=ppm)
    got = set(read_back_jsonl(out)["doc_id"].to_pylist())

    base = set(_oracle(training_corpus_sql())["doc_id"])
    mix = set(documents_mixture_sample(SF, rates_bp=rates)
              .to_pandas()["doc_id"])
    lm = lm_familiarity_scores(SF).to_pandas()
    lm_ok = set(lm.loc[lm["n_known_bigrams"] * 1_000_000
                       >= ppm * lm["n_bigrams"], "doc_id"])
    want = base & mix & lm_ok
    assert got == want
    assert 0 < len(got) < len(base), "gates were no-ops on the tiny corpus"


@pytest.mark.usefixtures("ray_session")
def test_cli_export_command_round_trips(tmp_path, capsys):
    """`python -m raycrawl export` ships the training pipeline as a Ray
    job: one JSON summary line, a committed export tree, and back-compat —
    the flat round-3 crawl invocation still parses as the crawl command."""
    import json

    from raycrawl.__main__ import _build_parser, main
    from raycrawl.io_sinks import read_back_jsonl
    from raycrawl.pipeline import training_corpus_sql

    out = str(tmp_path / "corpus")
    rc = main(["export", "--sf-dir", SF, "--out", out, "--num-shards", "2"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    ora = _oracle(training_corpus_sql())
    assert summary["partitions"] == {
        str(k): int(v) for k, v in ora.groupby("lang").size().items()}
    assert summary["rows"] == len(ora)
    got = read_back_jsonl(out).to_pandas()
    assert sorted(got["doc_id"]) == sorted(ora["doc_id"])

    flat = _build_parser().parse_args(
        ["crawl", "--corpus", "c", "--seed", "s", "--depth", "2",
         "--ckpt", "k"])
    assert flat.cmd == "crawl" and flat.depth == 2
