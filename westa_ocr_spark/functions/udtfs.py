"""Python UDTFs (Spark 4 table functions) — the §2.9 UDTF surface.

The reference's page-block split (X1: ``--- PAGE N ---`` delimiter,
blank pages dropped, 1-based renumbering —
``/root/reference/docs/google_apps_script_reference.md:347-407``) is
implemented three ways in this repo, each oracled against the same
DuckDB SQL:

* pure-SQL ``split``/``posexplode`` (registry ``split_pages_explode``)
  — the JVM/codegen scale path;
* the structured parser (``operators/parse_details.py``);
* this module: a registered Python UDTF, the Spark-4-native surface
  for one-row-to-N-rows Python logic (``SELECT ... FROM t, LATERAL
  page_split(...)``). Row-based Python — keep it OFF the 100-TB hot
  path (the SQL form exists for that); its value is the API surface
  and as an executable cross-check of the other two.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_PAGE_DELIM = re.compile(r"--- PAGE [0-9]+ ---")


@udtf(returnType="doc_id bigint, page_no bigint, block string")
class PageSplit:
    """(doc_id, raw) -> one row per non-blank page block, renumbered
    1-based in document order — identical semantics to the SQL
    ``split_pages_explode`` form (shared oracle)."""

    def eval(self, doc_id: int, raw: str):  # noqa: D102
        if raw is None:
            return
        n = 0
        for seg in _PAGE_DELIM.split(raw):
            # SQL trim() strips SPACES only (not newlines) in both
            # Spark and DuckDB — mirror that, not Python's .strip()
            s = seg.strip(" ")
            if s:
                n += 1
                yield (doc_id, n, s)


def register(spark) -> None:
    """Idempotent registration of the ``page_split`` table function."""
    spark.udtf.register("page_split", PageSplit)


__all__ = ["PageSplit", "register"]
