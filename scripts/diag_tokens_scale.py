"""Tokens-family strong-scaling probe: corpus_token_budget at N vs 4N cores.

The validation pass's 16M-row curve is the headline north-rule evidence;
this script extends the same two-parallelism-levels protocol to the r5
tokens family (LM train+score -> perplexity gate -> BPE encode -> budget
audit, i.e. `corpus_token_budget`) so the scaling claim covers the
corpus-preparation path too, not just drift validation.

The corpus is synthesized deterministically INSIDE the job (no files):
``docs`` docs x ``WORDS_PER_DOC`` words, each word drawn from a ~30k-word
synthetic vocabulary via xxhash64(doc_id, position) — identical bytes at
every parallelism level, partitioned by spark.range's default parallelism
so each level starts from its natural partition count.  Generation is a
codegen expression chain and rides along in the scans.

Protocol matches diag_tokhist_scale.py: one FRESH JVM per (cores) point
via a subprocess (reused gateway JVMs poison comparisons — sandbox trap),
first attempt discarded as warmup, contention snapshot around each run.

Usage: python scripts/diag_tokens_scale.py 500000 8 32
       (docs, then one or more core counts; add --attempts K)
Emits one JSON line per (cores, attempt) plus a summary with step
efficiencies.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORDS_PER_DOC = 50
BASE_VOCAB = [
    "join", "hash", "row", "batch", "scan", "customer", "column", "filter",
    "small", "slow", "merge", "order", "vector", "line", "data", "table",
    "agg", "value", "key", "stream", "window", "spark", "group", "part",
    "big", "sort", "query", "fast", "the", "dup", "a",
]
SUFFIX_MOD = 997  # ~31 * 997 ≈ 30.9k distinct words


def synth_docs(spark, n_docs: int):
    from pyspark.sql import functions as F

    base = F.array(*[F.lit(w) for w in BASE_VOCAB])

    def word(i):
        # Zipf-ish suffix: uniform draw from [0, U) where U is itself
        # uniform in [1, SUFFIX_MOD] — small suffixes dominate, mirroring
        # real text's n-gram reuse.  A uniform suffix makes nearly every
        # bigram/trigram unique, which no natural corpus does — and which
        # bloats the LM count dims to corpus size (first version of this
        # probe OOMed exactly there when the static planner broadcast a
        # 24M-row "dim").
        h1 = F.xxhash64(F.col("id"), i)
        h2 = F.xxhash64(F.col("id"), i, F.lit(1))
        bound = F.pmod(h1, SUFFIX_MOD) + 1
        return F.concat(
            F.element_at(
                base, (F.pmod(h1, len(BASE_VOCAB)) + 1).cast("int")
            ),
            F.pmod(h2, bound).cast("string"),
        )

    text = F.concat_ws(" ", F.array(*[word(F.lit(i)) for i in range(WORDS_PER_DOC)]))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def run_one(n_docs: int, cores: int, attempts: int) -> None:
    sys.path.insert(0, REPO)
    import bench

    from aumos_drift_detector_spark.operators.bpe import DEMO_MERGES, BpeTokenizer
    from aumos_drift_detector_spark.plans.corpus_pipeline import corpus_token_budget

    spark = bench.make_session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    # The static planner's pre-execution cardinality estimate for the
    # LM's post-aggregation bigram/trigram dims is optimistic and can
    # pick a driver-killing broadcast; cap the STATIC threshold and let
    # AQE re-convert joins using real runtime sizes (the behavior a
    # production cluster config pins the same way).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(8 * 1024 * 1024))
    tok = BpeTokenizer(merges=tuple(DEMO_MERGES))
    for attempt in range(attempts):
        snap = bench.contention_snapshot()
        t0 = time.monotonic()
        docs = synth_docs(spark, n_docs)
        out = corpus_token_budget(
            docs, "doc_id", "text", tok, ppl_max=1e9
        ).collect()
        wall = round(time.monotonic() - t0, 2)
        print(
            json.dumps(
                {
                    "cores": cores,
                    "docs": n_docs,
                    "words": n_docs * WORDS_PER_DOC,
                    "attempt": attempt,
                    "wall_sec": wall,
                    "words_per_sec": round(n_docs * WORDS_PER_DOC / wall, 1),
                    "n_tokens_kept": out[0]["n_tokens_kept"],
                    "contention": snap,
                }
            ),
            flush=True,
        )
    spark.stop()


def main() -> None:
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        run_one(int(sys.argv[i + 1]), int(sys.argv[i + 2]), int(sys.argv[i + 3]))
        return
    argv = sys.argv[1:]
    attempts = 2
    if "--attempts" in argv:
        i = argv.index("--attempts")
        attempts = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]
    n_docs, levels = int(args[0]), [int(a) for a in args[1:]]
    results = {}
    for cores in levels:
        proc = subprocess.run(
            [
                sys.executable, os.path.abspath(__file__),
                "--one", str(n_docs), str(cores), str(attempts),
            ],
            capture_output=True, text=True,
        )
        sys.stdout.write(proc.stdout)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-2000:])
            sys.exit(proc.returncode)
        rows = [json.loads(ln) for ln in proc.stdout.strip().splitlines()]
        # first attempt is JVM warmup — keep the best of the rest
        timed = rows[1:] or rows
        results[cores] = min(r["wall_sec"] for r in timed)
    if len(results) >= 2:
        lv = sorted(results)
        summary = {"docs": n_docs, "walls": results}
        for a, b in zip(lv, lv[1:]):
            sp = results[a] / results[b]
            summary[f"speedup_{a}to{b}"] = round(sp, 2)
            summary[f"efficiency_{a}to{b}"] = round(sp / (b / a), 2)
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
