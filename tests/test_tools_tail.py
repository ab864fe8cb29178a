"""Service/debug tools tail: snippets (SnippetGenerator.java:20-160),
indicator part (DocumentIndicatorWriter.java:20-40), xcount
(XCountFn.java:35-58), dump-keys/dump-index (DumpKeysFn/DumpIndexFn)."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from galago_git_spark.operators.snippets import best_snippet, snippets_frame


def test_best_snippet_highlights_and_windows():
    text = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "needle lambda mu nu xi omicron pi rho sigma tau"
    )
    s = best_snippet(text, ["needle"])
    assert "<strong>needle</strong>" in s
    # half-width 5 window around the match, ellipses at both cut edges
    assert s.startswith("...") and s.endswith("...")
    assert "zeta" in s and "alpha" not in s and "tau" not in s


def test_best_snippet_merges_near_matches():
    text = "x " * 30 + "cat dog " + "y " * 30
    s = best_snippet(text, ["cat", "dog"])
    assert "<strong>cat</strong> <strong>dog</strong>" in s


def test_best_snippet_no_match_leading_text():
    s = best_snippet("one two three four five six seven eight", ["zzz"])
    assert s.startswith("one two")
    assert "<strong>" not in s


def test_snippets_frame(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "lazy dog sleeps")],
        "doc_id long, text string",
    )
    out = {r["doc"]: r["snippet"] for r in snippets_frame(docs, ["fox", "dog"]).collect()}
    assert "<strong>fox</strong>" in out[1]
    assert "<strong>dog</strong>" in out[2]


def test_indicator_part_roundtrip(spark, tmp_path):
    from galago_git_spark.index.build import (
        build_index,
        build_indicator_part,
        open_index,
    )
    from galago_git_spark.query.executor import compile_indicator, execute
    from galago_git_spark.query.parser import parse
    from galago_git_spark.query.traversals import transform
    from galago_git_spark.sources.corpus import synthetic_code_corpus

    corpus = synthetic_code_corpus(spark, n_docs=30, seed=5)
    build_index(corpus, str(tmp_path))
    ind = spark.createDataFrame(
        [(d, d % 3 == 0) for d in range(30)], "doc long, indicator boolean"
    )
    build_indicator_part(ind, str(tmp_path))
    idx = open_index(spark, str(tmp_path))
    got = {
        r["doc"]
        for r in compile_indicator(transform(parse("#indicator()")), idx).collect()
    }
    assert got == {d for d in range(30) if d % 3 == 0}
    # composes with #require at the ranking level
    out = execute("#require(#indicator() #combine(def))", idx, k=30).collect()
    assert out and all(r["doc"] % 3 == 0 for r in out)


def _cli(args: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "galago_git_spark", *args],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    return json.loads(
        [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    )


@pytest.fixture(scope="module")
def cli_index(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cliidx") / "idx")
    _cli(["build", "--input", "synthetic:50", "--index", d, "--positions",
          "--cores", "2"])
    return d


def test_xcount_cli(spark, cli_index):
    r = _cli(["xcount", "--index", cli_index, "--x", "def",
              "--x", "#od:1(def def)", "--cores", "2"])
    # oracle: cf of 'def' from the termstats part
    cf = (
        spark.read.parquet(f"{cli_index}/termstats")
        .filter(F.col("term") == "def").collect()[0]["cf"]
    )
    assert r["counts"]["def"] == cf
    assert r["counts"]["#od:1(def def)"] >= 0


def test_dump_keys_and_index_cli(cli_index):
    r = _cli(["dump-keys", "--index", cli_index, "--part", "termstats",
              "--limit", "50", "--cores", "2"])
    assert r["keys"] > 0
    r2 = _cli(["dump-index", "--index", cli_index, "--part", "lengths",
               "--limit", "10", "--cores", "2"])
    assert r2["rows"] == 10


def test_build_special_cli(spark, cli_index, tmp_path):
    """``build-special`` (BuildSpecialPart.java): prior + indicator parts
    loaded from TSV files of <identifier>\\t<value> lines — numeric ids,
    external names, missing identifiers dropped, prob->ln conversion."""
    import math

    from galago_git_spark.index.build import open_index

    # indicator from mixed ids/names; one bogus identifier ignored
    idx0 = open_index(spark, cli_index)
    names = {
        r["doc"]: f"{r['repo']}:{r['path']}@{r['commit']}"
        for r in idx0.names.collect()
    }
    ind_file = tmp_path / "ind.tsv"
    ind_file.write_text(
        f"0\ttrue\n1\tfalse\n{names[2]}\ttrue\nnot-a-doc\ttrue\n"
    )
    r = _cli(["build-special", "--index", cli_index, "--type", "indicator",
              "--input", str(ind_file), "--cores", "2"])
    assert r["rows"] == 3  # bogus line dropped
    idx = open_index(spark, cli_index)
    got = {
        (row["doc"], row["indicator"]) for row in idx.indicator.collect()
    }
    assert got == {(0, True), (1, False), (2, True)}

    # priors: prob values stored as ln(p)
    pr_file = tmp_path / "p.tsv"
    pr_file.write_text("0\t0.5\n1\t0.25\n")
    r2 = _cli(["build-special", "--index", cli_index, "--type", "prior",
               "--prior-type", "prob", "--input", str(pr_file),
               "--cores", "2"])
    assert r2["rows"] == 2
    idx2 = open_index(spark, cli_index)
    pri = {row["doc"]: row["prior"] for row in idx2.priors.collect()}
    assert abs(pri[0] - math.log(0.5)) < 1e-12
    assert abs(pri[1] - math.log(0.25)) < 1e-12


def test_tokenize_cli():
    r = _cli(["tokenize", "--text", "<title>Running Tables</title> body",
              "--tag-fields", "title", "--stemmer", "porter2"])
    assert r["terms"] == ["run", "tabl", "bodi"]
    assert r["tags"] == [{"field": "title", "begin": 1, "end": 3}]
    r2 = _cli(["tokenize", "--text", "a b a"])
    assert r2["n_terms"] == 3 and r2["n_unique"] == 2


def test_overwrite_manifest_cli(cli_index):
    r = _cli(["overwrite-manifest", "--index", cli_index,
              "--set", "note=patched", "--set", "retention_days=30"])
    assert r["params_set"] == {"note": "patched", "retention_days": 30}
    import json as _json

    with open(f"{cli_index}/manifest.json") as f:
        params = _json.load(f)["params"]
    assert params["note"] == "patched" and params["retention_days"] == 30


def test_build_partial_cli(spark, tmp_path):
    """build-partial (BuildPartialIndex.java): subset index from a name
    list over the source corpus; inherits the source's stemmer param."""
    import os

    from galago_git_spark.index.build import open_index

    corpus_dir = str(tmp_path / "corpus")
    rows = [
        ("r", f"d{i}.py", f"c{i}", "py", f"tables running doc {i}")
        for i in range(10)
    ]
    spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string",
    ).write.parquet(corpus_dir)
    src = str(tmp_path / "src")
    _cli(["build", "--input", corpus_dir, "--index", src,
          "--stemmer", "porter2", "--cores", "2"])
    names_file = tmp_path / "names.txt"
    names_file.write_text("r:d1.py@c1\nr:d4.py@c4\nr:d7.py@c7\n")
    out = str(tmp_path / "partial")
    r = _cli(["build-partial", "--index", src, "--names", str(names_file),
              "--output", out, "--corpus", corpus_dir, "--cores", "2"])
    assert r["n_docs"] == 3 and r["requested"] == 3
    pidx = open_index(spark, out)
    assert {x["path"] for x in pidx.names.collect()} == {
        "d1.py", "d4.py", "d7.py"
    }
    # stemmer inherited from the source manifest
    assert pidx.default_text_part == "postings.porter2"
    assert not os.path.exists(os.path.join(out, "corpus_parquet"))


def test_stemmer_conflation_cli(spark, cli_index):
    """stemmer-conflation (BuildStemmerConflation.java:34-47,70-118):
    conflation part maps stem -> sorted distinct surface forms; by
    default the vocabulary is the index's own postings part."""
    from galago_git_spark.functions.stem import porter2

    r = _cli(["stemmer-conflation", "--index", cli_index,
              "--stemmer", "porter2", "--cores", "2"])
    assert r["stems"] > 0
    rows = spark.read.parquet(f"{cli_index}/conflation.porter2").collect()
    vocab = {
        v["term"]
        for v in spark.read.parquet(f"{cli_index}/postings")
        .select("term").distinct().collect()
    }
    seen: set[str] = set()
    for row in rows:
        for t in row["terms"]:
            assert porter2(t) == row["stem"]
            seen.add(t)
        assert list(row["terms"]) == sorted(set(row["terms"]))
    assert seen == vocab  # every surface form accounted for exactly once
    # part is manifest-recorded and readable through the dump tools
    with open(f"{cli_index}/manifest.json") as f:
        assert "conflation.porter2" in json.load(f)["parts"]
    r2 = _cli(["dump-keys", "--index", cli_index, "--part",
               "conflation.porter2", "--limit", "5", "--cores", "2"])
    assert r2["keys"] > 0


def test_version_cli():
    r = _cli(["version"])
    assert r["cmd"] == "version" and r["version"] and r["pyspark"]


def test_tokenize_and_grab_stats_cli(tmp_path, cli_index):
    """TokenizeAndGrabStats.java:40-69: tokenize a document, report each
    unique term's index statistics + collection length."""
    f = tmp_path / "doc.txt"
    f.write_text("def run(): return run")
    r = _cli(["tokenize", "--file", str(f), "--index", cli_index,
              "--cores", "2"])
    assert r["clen"] > 0
    by_term = {t["term"]: t for t in r["term_stats"]}
    assert set(by_term) == {"def", "run", "return"}
    # 'def' appears in every synthetic doc; stats must be real counts
    assert by_term["def"]["df"] > 0 and by_term["def"]["cf"] >= by_term["def"]["df"]


def test_debug_query_cli(cli_index):
    r = _cli(["debug-query", "--index", cli_index,
              "--query", "#combine(def return)", "--k", "2", "--cores", "2"])
    res = r["traces"][0]["results"]
    assert len(res) == 2 and res[0]["rank"] == 1
    ann = res[0]["annotation"]
    assert ann["type"] == "combine"
    assert ann["returnValue"] == pytest.approx(res[0]["score"], abs=1e-5)
    kinds = {c["kind"] for c in ann["children"]}
    assert kinds == {"score"}
    leaf = ann["children"][0]["children"][0]
    assert leaf["kind"] == "count" and isinstance(leaf["returnValue"], int)


def test_dump_key_value_and_name_length_cli(spark, cli_index):
    """DumpKeyValueFn.java:37-62 / DumpNamesLengths.java:32-58 analogs."""
    ts = spark.read.parquet(f"{cli_index}/termstats")
    row = ts.filter(F.col("term") == "def").collect()[0]
    r = _cli(["dump-key-value", "--index", cli_index, "--part", "postings",
              "--key", "def", "--cores", "2"])
    assert r["rows"] == row["df"]  # one posting row per matching doc
    # doc-keyed part: key parses as an id
    r2 = _cli(["dump-key-value", "--index", cli_index, "--part", "lengths",
               "--key", "0", "--cores", "2"])
    assert r2["rows"] == 1
    r3 = _cli(["dump-name-length", "--index", cli_index, "--cores", "2"])
    assert r3["rows"] == 50


def test_dump_term_stats_ext_cli(spark, cli_index):
    """DumpTermStatisticsExtFn.java:27-50: thresholds drop rare terms."""
    ts = spark.read.parquet(f"{cli_index}/termstats")
    n_all = ts.count()
    n_kept = ts.filter((F.col("cf") >= 5) & (F.col("df") >= 2)).count()
    assert 0 < n_kept < n_all
    r = _cli(["dump-term-stats-ext", "--index", cli_index,
              "--parts", "termstats", "--min-tf", "5", "--min-df", "2",
              "--cores", "2"])
    assert r["terms"] == n_kept


def test_harvest_links_pagerank_dump_corpus_cli(spark, tmp_path):
    """HarvestLinksFn / PageRankFn / DumpCorpusFn analogs over a corpus
    whose import graph is known: alpha->beta,gamma; beta->gamma,alpha;
    gamma->alpha,beta; delta->alpha,beta (delta has no in-links)."""
    import os

    from galago_git_spark.index.build import build_index, open_index

    rows = [
        ("r1", f"src/{m}.py", "c0", "python",
         f"import {d1}\nfrom {d2} import x\ndef {m}(): pass\n")
        for m, d1, d2 in [
            ("alpha", "beta", "gamma"), ("beta", "gamma", "alpha"),
            ("gamma", "alpha", "beta"), ("delta", "alpha", "beta"),
        ]
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string",
    )
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, positions=False)
    corpus.write.mode("overwrite").parquet(os.path.join(idx, "corpus_parquet"))

    out = str(tmp_path / "lh")
    r = _cli(["harvest-links", "--index", idx, "--out", out, "--cores", "2"])
    assert r["links"] == 8 and r["edges"] == 8 and r["anchor_targets"] == 3

    # resolved edges: delta (doc of src/delta.py) must have no in-links
    names = {r2["path"]: r2["doc"]
             for r2 in spark.read.parquet(f"{idx}/names").collect()}
    dsts = {r2["dst"] for r2 in
            spark.read.parquet(f"{out}/edges").collect()}
    assert names["src/delta.py"] not in dsts

    pr_out = str(tmp_path / "pr")
    r3 = _cli(["pagerank", "--index", idx, "--edges", f"{out}/edges",
               "--out", pr_out, "--to-prior", "--cores", "2"])
    assert r3["docs"] == 4 and r3["prior_part"]
    pr = {r2["doc"]: r2["score"]
          for r2 in spark.read.parquet(pr_out).collect()}
    # dangling-free in-link mass: delta (never referenced) scores lowest
    assert min(pr, key=pr.get) == names["src/delta.py"]
    idx_open = open_index(spark, idx)
    assert idx_open.priors is not None

    r4 = _cli(["dump-corpus", "--index", idx, "--limit", "2", "--cores", "2"])
    assert r4["rows"] == 2


def test_batch_search_seed_shuffle_cli(cli_index, tmp_path):
    """TimedBatchSearch.java:122-137: seeded shuffle + per-query times."""
    qf = tmp_path / "q.json"
    qf.write_text(json.dumps({"queries": [
        {"number": "q1", "text": "#combine(def return)"},
        {"number": "q2", "text": "#combine(value)"},
    ]}))
    r = _cli(["batch-search", "--index", cli_index, "--queries", str(qf),
              "--repeats", "2", "--seed", "7", "--timing", "--cores", "2"])
    assert r["n_queries"] == 2 and r["repeats"] == 2
    assert set(r["query_times_sec"]) == {"q1", "q2"}


def test_read_corpus_table_formats(spark, monkeypatch):
    """--table-format routing (north-rule input is an Iceberg corpus
    table): 'table' -> spark.table, 'parquet' -> spark.read.parquet,
    other formats -> spark.read.format(fmt).load; a missing runtime jar
    surfaces as an actionable SystemExit, not a JVM stack."""
    import pytest

    from galago_git_spark.cli import _read_corpus_table

    calls = {}

    class FakeReader:
        def format(self, fmt):
            calls["format"] = fmt
            return self

        def load(self, path):
            calls["load"] = path
            return "df-load"

        def parquet(self, path):
            calls["parquet"] = path
            return "df-parquet"

    class FakeSpark:
        read = FakeReader()

        def table(self, name):
            calls["table"] = name
            return "df-table"

    fs = FakeSpark()
    assert _read_corpus_table(fs, "cat.db.corpus", "table") == "df-table"
    assert calls["table"] == "cat.db.corpus"
    assert _read_corpus_table(fs, "/p", "parquet") == "df-parquet"
    assert _read_corpus_table(fs, "/p", "iceberg") == "df-load"
    assert calls["format"] == "iceberg"

    class BrokenReader(FakeReader):
        def load(self, path):
            raise RuntimeError("Failed to find data source: iceberg")

    class BrokenSpark(FakeSpark):
        read = BrokenReader()

    with pytest.raises(SystemExit, match="iceberg-spark-runtime"):
        _read_corpus_table(BrokenSpark(), "/p", "iceberg")


def test_batch_search_daat_batch_cli(tmp_path):
    """`batch-search --mode daat-batch`: the whole-batch single-job WAND
    tier end-to-end through the CLI (packed build -> resident cache ->
    one cogroup/grouped-map job), per-qid top-k identical to per-query
    `search --wand --scorer bm25`."""
    idx = str(tmp_path / "idx")
    _cli(["build", "--input", "synthetic:60", "--index", idx, "--packed",
          "--cores", "2"])
    qf = tmp_path / "q.json"
    qf.write_text(json.dumps({"queries": [
        {"number": "q1", "text": "#combine(def return)"},
        {"number": "q2", "text": "#combine(class def)"},
    ]}))
    r = _cli(["batch-search", "--index", idx, "--queries", str(qf),
              "--mode", "daat-batch", "--timing", "--repeats", "2",
              "--k", "5", "--cores", "2"])
    assert r["mode"] == "daat-batch" and r["n_queries"] == 2
    assert r["result_rows"] == 10 and len(r["run_secs"]) == 2
    # rank identity per query against the single-query WAND tier
    out = subprocess.run(
        [sys.executable, "-m", "galago_git_spark", "batch-search",
         "--index", idx, "--queries", str(qf), "--mode", "daat-batch",
         "--k", "5", "--cores", "2"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    got = {}
    for line in out.stderr.strip().splitlines():
        p = line.split()
        if len(p) == 6 and p[1] == "Q0":
            got.setdefault(p[0], []).append((int(p[3]), int(p[2]),
                                             round(float(p[4]), 6)))
    for qnum, qtext in (("q1", "#combine(def return)"),
                        ("q2", "#combine(class def)")):
        ref = _cli(["search", "--index", idx, "--wand", "--scorer", "bm25",
                    "--query", qtext, "--k", "5", "--cores", "2"])
        want = [(x["rank"], x["doc"], round(x["score"], 6))
                for x in ref["results"]]
        assert sorted(got[qnum]) == want, qnum
