"""Generate committed golden files for the byte-identity gate (SURVEY.md §5.1).

Runs the single-threaded ORACLE kernel (document_ai_spark.kernel.extract —
the same code the Spark UDF calls, no Spark involved) over the tiny
deterministic corpus and writes, per url:

    tests/golden/<urlhash16>.txt          extracted text, byte-exact UTF-8
    tests/golden/<urlhash16>.spans.json   span dicts
    tests/golden/index.json               url -> {hash, kind, doc_hash}

Re-run only when the kernel SPEC intentionally changes; commit the diff.
Usage: python scripts/gen_goldens.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_ai_spark.kernel.extract import extract_document  # noqa: E402
from document_ai_spark.sources.pages import generate_rows  # noqa: E402

GOLDEN_N_DOCS = 200
GOLDEN_SEED = 42
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")


def url_hash(url: str) -> str:
    return hashlib.blake2b(url.encode(), digest_size=8).hexdigest()


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    index = {}
    for row in generate_rows(GOLDEN_N_DOCS, seed=GOLDEN_SEED):
        doc_hash, kind, text, spans, n_chars, n_blocks, err = extract_document(row["html"])
        uh = url_hash(row["url"])
        with open(os.path.join(OUT, f"{uh}.txt"), "wb") as f:
            f.write(text.encode("utf-8"))
        with open(os.path.join(OUT, f"{uh}.spans.json"), "w") as f:
            json.dump(spans, f, sort_keys=True)
        index[row["url"]] = {"hash": uh, "kind": kind, "doc_hash": doc_hash, "n_chars": n_chars}
    with open(os.path.join(OUT, "index.json"), "w") as f:
        json.dump(index, f, indent=1, sort_keys=True)
    print(f"wrote {len(index)} goldens to {OUT}")


if __name__ == "__main__":
    main()
