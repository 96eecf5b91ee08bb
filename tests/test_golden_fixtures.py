"""Pinned byte-identity goldens (FIXTURES.md §2).

``tests/fixtures/golden_extractions.json`` freezes sha256 hashes of
every extraction output over the first 200 corpus docs at
fixture-generation time. Unlike the kernel-derived expectations in
test_extract_operator.py (which move with the kernel), these are
static files in git: ANY unintended change to corpus generation or
extraction semantics fails here. An intentional contract change must
regenerate the file explicitly and say so in the commit.
"""

import hashlib
import json
import os

from westa_ocr_spark.corpus import generate_rows
from westa_ocr_spark.operators.extract import extract_rows

GOLDEN = os.path.join(
    os.path.dirname(__file__), "fixtures", "golden_extractions.json"
)


def test_extractions_match_pinned_goldens():
    with open(GOLDEN) as f:
        golden = json.load(f)

    produced = {}
    for row in generate_rows(200):
        for out in extract_rows(row["url"], row["html"]):
            key = f"{out['url']}#{out['page_index']}"
            produced[key] = {
                "status": out["status"],
                "text_sha256": (
                    hashlib.sha256(out["text"].encode()).hexdigest()
                    if out["text"] is not None else None
                ),
                "n_blocks": out["n_blocks"],
                "spans_sha256": hashlib.sha256(
                    json.dumps(out["spans"], sort_keys=True).encode()
                ).hexdigest() if out["spans"] is not None else None,
            }

    assert produced.keys() == golden.keys()
    diffs = [k for k in golden if produced[k] != golden[k]]
    assert not diffs, f"extraction drift on {len(diffs)} rows: {diffs[:5]}"
