"""Two-level scaling evidence for the raw-file ingestion plane.

Renders a deterministic trectext corpus (pure Python, identical bytes at
any parallelism), then times the record-split parse
(``read_corpus_split`` -> ``as_corpus`` -> count) at two local[N]
levels in fresh JVMs — the sandbox stand-in for the north rule's
N-vs-4N-executor scaling check, same input at both levels.

Usage: python scripts/formats_scaling.py [lo hi]   (default 2 8)
Prints one JSON object with per-level parse seconds, docs/sec, and the
scaling efficiency speedup/(hi/lo).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

N_DOCS = int(os.environ.get("FMT_SCALING_DOCS", "200000"))
N_SHARDS = 32

WORDS = ("def class return import table join scan filter hash merge "
         "window batch shuffle spark index query block score delta").split()


def render(dirpath: str) -> None:
    os.makedirs(dirpath, exist_ok=True)
    shards = [[] for _ in range(N_SHARDS)]
    for i in range(N_DOCS):
        body = " ".join(WORDS[(i * 7 + j) % len(WORDS)] for j in range(120))
        shards[i % N_SHARDS].append(
            f"<DOC>\n<DOCNO>D{i}</DOCNO>\n<TEXT>\n{body}\n</TEXT>\n</DOC>\n"
        )
    for s, docs in enumerate(shards):
        with open(os.path.join(dirpath, f"part{s:02d}.trectext"), "w") as f:
            f.write("".join(docs))


CHILD = r"""
import json, sys, time
from pyspark.sql import SparkSession
cores, path = int(sys.argv[1]), sys.argv[2]
spark = (SparkSession.builder.master(f"local[{cores}]")
         .appName("fmt-scaling")
         .config("spark.sql.shuffle.partitions", str(cores))
         .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from galago_git_spark.sources.formats import as_corpus, read_corpus_split
df = as_corpus(read_corpus_split(spark, path))
df.count()  # warm: file listing + plan; parse timing below is steady-state
times = []
for _ in range(3):
    t0 = time.perf_counter()
    n = df.count()
    times.append(time.perf_counter() - t0)
times.sort()
print(json.dumps({"n": n, "sec": round(times[1], 3)}))
spark.stop()
"""


def run_level(cores: int, path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), path],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    tmp = tempfile.mkdtemp(prefix="fmt_scaling_")
    render(tmp)
    levels = {}
    for cores in (lo, hi):
        r = run_level(cores, tmp)
        assert r["n"] == N_DOCS, r
        levels[cores] = {
            "parse_sec": r["sec"],
            "docs_per_sec": round(N_DOCS / r["sec"], 1),
        }
    speedup = levels[lo]["parse_sec"] / levels[hi]["parse_sec"]
    result = {
        "component": "read_corpus_split (trectext parse)",
        "n_docs": N_DOCS,
        "n_shards": N_SHARDS,
        "levels": levels,
        "speedup": round(speedup, 3),
        "efficiency": round(speedup / (hi / lo), 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
