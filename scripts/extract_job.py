"""Production extraction job — the spark-submit entry point (north rule).

Ship the package alongside the job and run it on a cluster:

    python scripts/build_dist.py          # -> dist/document_ai_spark.zip
    spark-submit --master <cluster> --py-files dist/document_ai_spark.zip \
        scripts/extract_job.py <pages_dir> <out_dir> [n_groups] [salt_partitions] [files_per_day]

The job is resumable: re-submitting with the same <out_dir> skips bucket
groups already recorded 'done' in <out_dir>/_checkpoint (exactly-once via
per-group overwrite; see document_ai_spark/plans/pipeline.py). On a real
cluster the parquet paths become Iceberg tables — the plan is unchanged.
"""

from __future__ import annotations

import json
import os
import sys

# When launched via spark-submit without --py-files (local dev), make the
# repo importable; with --py-files the zip on sys.path wins.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    pages_dir, out_dir = sys.argv[1], sys.argv[2]
    n_groups = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    salt_partitions = int(sys.argv[4]) if len(sys.argv) > 4 else None
    files_per_day = int(sys.argv[5]) if len(sys.argv) > 5 else 8

    from pyspark.sql import SparkSession

    from document_ai_spark.plans.pipeline import run_extraction

    # spark-submit supplies master/deploy config; we only pin the
    # workload-specific settings (Arrow batching for MB-sized binary rows).
    spark = (
        SparkSession.builder.appName("document_ai_spark.extract")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    summary = run_extraction(
        spark,
        pages_path=pages_dir,
        out_dir=out_dir,
        run_dir=os.path.join(out_dir, "_checkpoint"),
        n_groups=n_groups,
        salt_partitions=salt_partitions,
        files_per_day=files_per_day,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
