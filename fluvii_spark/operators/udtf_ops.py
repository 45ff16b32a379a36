"""Python UDTFs (SURVEY.md §2.2 UDF/UDAF/UDTF row): table functions that
expand one input row into N output rows with arbitrary Python logic —
Spark 3.5+ ``@udtf``. The reference's nearest concept is the ``app_function``
producing 0..n messages per input (flatMap, ``README.md:139-152``); a UDTF
is the SQL-addressable version of that contract.

Kept deliberately small: UDTFs run row-at-a-time Python, so anything
expressible as built-ins (explode/transform) should use those — these exist
for genuinely imperative expansions.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sentence STRING, idx INT, n_tokens INT")
class SplitSentences:
    """One row per sentence of the input text.

    SQL: ``SELECT s.* FROM docs, LATERAL SplitSentences(text) s`` (register
    with ``spark.udtf.register``).
    """

    def eval(self, text: str):  # noqa: D401
        if text is None:
            return
        for i, raw in enumerate(text.replace("!", ".").replace("?", ".").split(".")):
            s = raw.strip()
            if s:
                yield s, i, len(s.split(" "))


@udtf(returnType="k STRING, v STRING")
class ExplodeKeyValues:
    """Parse 'k1=v1;k2=v2' option strings into rows (config blobs, URL
    params — the imperative-parse case built-ins don't cover cleanly)."""

    def eval(self, s: str):
        if s is None:
            return
        for part in s.split(";"):
            if "=" in part:
                k, _, v = part.partition("=")
                yield k.strip(), v.strip()


def register_udtfs(spark) -> None:
    """Make the UDTFs SQL-addressable on a session."""
    spark.udtf.register("split_sentences", SplitSentences)
    spark.udtf.register("explode_kv", ExplodeKeyValues)
