"""Physical-plan shape summary — one implementation for every consumer.

Used by ``tools/plan_audit.py`` (writes PLANS.md for the whole inventory),
the CLI ``plan`` command, and available to tests: counts shuffle Exchanges
(distinguishing AQE ReusedExchange), join strategies, parquet filter
pushdown on the scan, and whole-stage codegen. Only the ``formatted``
explain mode numbers operators as ``(n) Op``, so :func:`audit` is only
meaningful on formatted plans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

JOIN_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string ``df.explain(mode)`` would print, returned not printed."""
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), mode
        )
    except AttributeError:
        # Spark Connect DataFrames carry no _sc/_jdf; capture the printed
        # explain instead (same text, one extra server round-trip).
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode=mode)
        return buf.getvalue()


def audit(plan: str) -> dict[str, object]:
    """Shape summary of a FORMATTED plan string (see module docstring)."""
    body = plan.split("== Physical Plan ==")[-1]
    joins = {
        op: len(re.findall(rf"\(\d+\) {op}\b", body)) for op in JOIN_OPS
    }
    joins = {k: v for k, v in joins.items() if v}
    return {
        "exchanges": len(re.findall(r"\(\d+\) Exchange", body)),
        "reused": len(re.findall(r"ReusedExchange", body)),
        "joins": ", ".join(
            f"{k}×{v}" if v > 1 else k for k, v in joins.items()
        ),
        "pushdown": "yes" if re.search(r"PushedFilters: \[[^\]]", body) else "",
        "codegen": "yes" if "codegen id" in body else "",
    }


def runtime_explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Execute the frame, then return its FINAL plan — under AQE the static
    explain is an unfinalized ``AdaptiveSparkPlan`` whose join strategies,
    partition coalescing, and codegen ids are only decided at runtime.

    A ``Dataset``'s ``queryExecution`` is a cached lazy val, so draining the
    frame through ``toLocalIterator`` (streamed — never materializes the
    whole result on the driver) finalizes THAT plan object; the subsequent
    explain carries ``isFinalPlan=true`` subtrees with the decisions AQE
    actually took. A ``noop``-sink write would NOT work here: it plans and
    executes a separate write query, leaving this frame's plan unfinalized.
    """
    for _ in df.toLocalIterator():
        pass
    return explain_str(df, mode)


def runtime_audit(df: DataFrame) -> dict[str, object]:
    """:func:`audit` of the executed plan, plus AQE-specific signals:
    whether the final plan is marked finalized, and how many
    ``AQEShuffleRead`` reads (partition coalescing / skew splitting)
    appear."""
    plan = runtime_explain_str(df)
    body = plan.split("== Physical Plan ==")[-1]
    out = audit(plan)
    out["final"] = "yes" if "isFinalPlan=true" in body else ""
    out["aqe_reads"] = len(re.findall(r"\(\d+\) AQEShuffleRead", body))
    return out
