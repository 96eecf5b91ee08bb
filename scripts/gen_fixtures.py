"""Regenerate the pinned extraction fixtures (FIXTURES.md §2).

Run explicitly after an INTENTIONAL extraction-contract or corpus
change (and say so in the commit message):

    PYTHONPATH=. python scripts/gen_fixtures.py

Writes:
* ``tests/fixtures/golden_extractions.json`` — sha256 hashes of every
  extraction output over the first 200 corpus docs (the byte-identity
  gate, tests/test_golden_fixtures.py).
* ``tests/fixtures/extract_expected.json`` — full expected values
  (url, page_index, status, kind, n_blocks, text_chars, text_sha256)
  for the same docs, loaded into DuckDB as the value oracle for the
  ``extract_pages_job`` / ``charset_extract`` registry queries.
* ``tests/fixtures/split_expected.json`` — expected standalone
  1-page payload sizes/hashes for every corpus PDF doc, the value
  oracle for ``split_pdf_payloads`` (round 5).
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from westa_ocr_spark.corpus import (  # noqa: E402
    charset_for,
    generate_rows,
    kind_for,
)
from westa_ocr_spark.operators.extract import extract_rows  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
N_DOCS = 200


def main() -> None:
    golden: dict[str, dict] = {}
    expected: list[dict] = []
    for i, row in enumerate(generate_rows(N_DOCS)):
        if kind_for(i) in ("html", "oversized"):
            cs_mode, _, cs_codec, _ = charset_for(i)
        else:
            cs_mode = cs_codec = None
        for out in extract_rows(row["url"], row["html"]):
            key = f"{out['url']}#{out['page_index']}"
            text_sha = (
                hashlib.sha256(out["text"].encode()).hexdigest()
                if out["text"] is not None else None
            )
            golden[key] = {
                "status": out["status"],
                "text_sha256": text_sha,
                "n_blocks": out["n_blocks"],
                "spans_sha256": hashlib.sha256(
                    json.dumps(out["spans"], sort_keys=True).encode()
                ).hexdigest() if out["spans"] is not None else None,
            }
            expected.append(
                {
                    "url": out["url"],
                    "page_index": out["page_index"],
                    "status": out["status"],
                    "kind": out["kind"],
                    "n_blocks": out["n_blocks"],
                    "text_chars": (
                        len(out["text"]) if out["text"] is not None else None
                    ),
                    "text_sha256": text_sha,
                    "charset_mode": cs_mode,
                    "charset_codec": cs_codec,
                    # raw extracted text: lets DuckDB oracles compute
                    # DERIVED values (lang-id, quality, token counts,
                    # fingerprints) for composed-pipeline queries
                    "text": out["text"],
                }
            )
    split_expected: list[dict] = []
    from westa_ocr_spark.kernel.pdf_mini import split_pdf

    for i, row in enumerate(generate_rows(N_DOCS)):
        if not row["html"].startswith(b"%PDF-"):
            continue
        try:
            for idx, page in enumerate(split_pdf(row["html"]), start=1):
                split_expected.append(
                    {
                        "url": row["url"],
                        "page_index": idx,
                        "mime_type": "application/pdf",
                        "status": "DONE",
                        "payload_bytes": len(page),
                        "payload_sha256": hashlib.sha256(page).hexdigest(),
                    }
                )
        except (ValueError, TypeError) as exc:
            split_expected.append(
                {
                    "url": row["url"],
                    "page_index": 1,
                    "mime_type": "application/pdf",
                    "status": "ERROR",
                    "payload_bytes": None,
                    "payload_sha256": None,
                }
            )
            del exc
    with open(os.path.join(FIXDIR, "golden_extractions.json"), "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    with open(os.path.join(FIXDIR, "extract_expected.json"), "w") as f:
        json.dump(expected, f, indent=1)
    with open(os.path.join(FIXDIR, "split_expected.json"), "w") as f:
        json.dump(split_expected, f, indent=1)
    statuses = [e["status"] for e in expected]
    print(
        f"wrote {len(golden)} golden rows, {len(expected)} expected rows "
        f"(DONE={statuses.count('DONE')}, ERROR={statuses.count('ERROR')})"
    )


if __name__ == "__main__":
    main()
