"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8, N -> 4N).

Sandbox substitution for two real cluster sizes (per driver instruction):
run the IDENTICAL extraction job on the IDENTICAL input at local[8] and
local[32], each in a FRESH JVM (subprocess), report docs/sec + MB/sec at
both, scaling efficiency = thr(32) / (4 * thr(8)), and assert the two
outputs are byte-identical per url (parallelism must not change results).

Usage:
    python scripts/bench_scaling.py [n_docs]          # default 60000
    python scripts/bench_scaling.py --worker N corpus out_dir   # internal
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cores: int, corpus: str, out: str) -> None:
    from pyspark.sql import functions as F

    from document_ai_spark.operators.extraction import extract_pages
    from document_ai_spark.plans.pipeline import compact_for_write, read_pages
    from document_ai_spark.session import get_spark

    spark = get_spark(app_name=f"scale{cores}", master=f"local[{cores}]")
    pages = read_pages(spark, corpus)
    n_docs = pages.count()
    mb_in = (pages.agg(F.sum(F.length("html"))).collect()[0][0] or 0) / 1e6
    # untimed warm pass over a slice: spin up the Arrow Python workers once
    # (long-running executors keep them warm; cold-start is not what the
    # N-vs-4N efficiency criterion measures)
    extract_pages(pages, salt_partitions=cores * 2).limit(4096).write.format(
        "noop"
    ).mode("overwrite").save()
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    extracted = compact_for_write(
        extract_pages(pages, salt_partitions=cores * 2), files_per_day=cores
    )
    extracted.write.mode("overwrite").partitionBy("warc_day").parquet(out)
    wall = time.time() - t0
    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "cores": cores,
                "wall_s": round(wall, 2),
                "n_docs": n_docs,
                "mb_in": round(mb_in, 1),
                "docs_per_sec": round(n_docs / wall, 1),
                "mb_per_sec": round(mb_in / wall, 2),
            }
        )
    )
    spark.stop()


def output_digest(out: str) -> str:
    """Corpus-level digest of (url, kind, text, spans-json): equal digests
    <=> byte-identical extracted text per url."""
    import duckdb

    con = duckdb.connect()
    row = con.execute(
        f"""
        SELECT md5(string_agg(
            url || '\x01' || kind || '\x01' || coalesce(text, '\x02')
                || '\x01' || coalesce(CAST(to_json(spans) AS VARCHAR), '\x02'),
            '\x03' ORDER BY url))
        FROM read_parquet('{out}/**/*.parquet', hive_partitioning=true)
        """
    ).fetchone()
    con.close()
    return row[0]


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    corpus = os.path.join(tempfile.gettempdir(), f"da_spark_scale_pages_{n_docs}")
    if not os.path.isdir(corpus):
        from document_ai_spark.sources.pages import write_pages_parquet

        print(f"generating corpus: {n_docs} docs -> {corpus}", file=sys.stderr)
        write_pages_parquet(corpus, n_docs, seed=42)

    results = {}
    digests = {}
    for cores in (8, 32):
        out = os.path.join(tempfile.gettempdir(), f"da_spark_scale_out_{cores}")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores), corpus, out],
            capture_output=True, text=True, cwd=REPO,
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("WORKER_RESULT ")), None
        )
        if line is None:
            print(proc.stdout[-3000:], file=sys.stderr)
            print(proc.stderr[-3000:], file=sys.stderr)
            raise SystemExit(f"worker local[{cores}] failed")
        results[cores] = json.loads(line[len("WORKER_RESULT "):])
        digests[cores] = output_digest(out)
        print(f"local[{cores}]: {results[cores]} digest={digests[cores]}", file=sys.stderr)

    eff = results[32]["docs_per_sec"] / (4 * results[8]["docs_per_sec"])
    summary = {
        "n_docs": n_docs,
        "local8": results[8],
        "local32": results[32],
        "scaling_efficiency": round(eff, 3),
        "byte_identical": digests[8] == digests[32],
        "pass": eff >= 0.8 and digests[8] == digests[32],
    }
    print(json.dumps(summary))
    if not summary["pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
