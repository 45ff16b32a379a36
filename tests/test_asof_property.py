"""Property test: asof_join vs pandas merge_asof — the independent oracle
for the engine's marquee custom join. Hypothesis generates small random
(key, ts, payload) frames; for every direction/tolerance combination the
distributed union-window plan must agree row-for-row with pandas'
reference implementation (NULL payloads included — the r4 struct-carry
fix is exactly what keeps these equal)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fluvii_spark.operators.asof import asof_join

KEYS = ["a", "b"]

rows_left = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.integers(min_value=0, max_value=50),  # seconds
    ),
    min_size=1,
    max_size=8,
)
rows_right = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.integers(min_value=0, max_value=50),
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
    ),
    min_size=0,
    max_size=8,
    # pandas merge_asof is underdetermined on duplicate right timestamps
    # (it keeps positional order); the operator documents caller-resolved
    # duplicates, so generate unique (key, ts) right rows
    unique_by=lambda r: (r[0], r[1]),
)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(max_examples=25, deadline=None)
@given(
    left=rows_left,
    right=rows_right,
    direction=st.sampled_from(["backward", "forward"]),
    tolerance=st.sampled_from([None, 0, 3, 10]),
)
def test_asof_matches_pandas_merge_asof(
    _spark, left, right, direction, tolerance
):
    spark = _spark
    base = pd.Timestamp("2024-01-01")
    lpdf = pd.DataFrame(
        {
            "k": [r[0] for r in left],
            "ts": [base + pd.Timedelta(seconds=r[1]) for r in left],
            "lid": range(len(left)),
        }
    )
    rpdf = pd.DataFrame(
        {
            # explicit dtypes so an EMPTY right side still merges (a bare
            # empty column would be float64 and break merge_asof's by=)
            "k": pd.Series([r[0] for r in right], dtype="object"),
            "ts": pd.Series(
                [base + pd.Timedelta(seconds=r[1]) for r in right],
                dtype="datetime64[ns]",
            ),
            "pay": pd.array([r[2] for r in right], dtype="Int64"),
        }
    )
    ldf = spark.createDataFrame(lpdf) if len(lpdf) else None
    rdf = spark.createDataFrame(
        rpdf.astype({"pay": "object"}).where(pd.notna(rpdf), None)
    ) if len(rpdf) else spark.createDataFrame(
        [], "k STRING, ts TIMESTAMP, pay LONG"
    )
    got_rows = asof_join(
        ldf,
        rdf,
        ["k"],
        "ts",
        "ts",
        right_payload=["pay"],
        tolerance_s=tolerance,
        direction=direction,
    ).collect()
    got = {
        r["lid"]: (None if r["right_pay"] is None else int(r["right_pay"]))
        for r in got_rows
    }

    lsorted = lpdf.sort_values("ts", kind="mergesort")
    rsorted = rpdf.sort_values("ts", kind="mergesort")
    ref = pd.merge_asof(
        lsorted,
        rsorted,
        on="ts",
        by="k",
        direction=direction,
        tolerance=None
        if tolerance is None
        else pd.Timedelta(seconds=tolerance),
    )
    want = {
        int(r.lid): (None if pd.isna(r.pay) else int(r.pay))
        for r in ref.itertuples()
    }
    assert got == want, (left, right, direction, tolerance)
