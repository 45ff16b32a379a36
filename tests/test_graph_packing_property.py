"""Property tests with pure-Python oracles for the two operators whose
semantics no SQL oracle can express directly: connected components
(union-find reference) and sequence packing (greedy first-fit replay)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@settings(max_examples=12, deadline=None)
@given(edges=edges_strategy, algorithm=st.sampled_from(["star", "propagate"]))
def test_connected_components_matches_union_find(spark, edges, algorithm):
    """Both CC strategies must produce the same PARTITION as union-find,
    with each cluster labeled by its minimum member (the operator's
    documented canonical-representative rule)."""
    from fluvii_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    got = {
        r["node"]: r["cluster"]
        for r in connected_components(df, algorithm=algorithm).collect()
    }
    want = _union_find(edges)
    # union-find's root is min-rooted by construction above
    assert got == want, (edges, algorithm)


sizes_strategy = st.lists(
    st.integers(min_value=1, max_value=9), min_size=1, max_size=12
)


@settings(max_examples=15, deadline=None)
@given(sizes=sizes_strategy, capacity=st.integers(min_value=3, max_value=12))
def test_pack_sequences_matches_greedy_replay(spark, sizes, capacity):
    """The distributed per-group fold must equal a sequential greedy
    first-fit over the rows in order — including sizes larger than the
    capacity (each such row occupies its own bin)."""
    from fluvii_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [("g", i, s) for i, s in enumerate(sizes)],
        "grp STRING, seq LONG, sz LONG",
    )
    got = {
        r["seq"]: r["bin"]
        for r in pack_sequences(df, ["grp"], "seq", "sz", capacity).collect()
    }
    bins, fill, b = {}, 0, 0
    for i, n in enumerate(sizes):
        if fill > 0 and fill + n > capacity:
            b, fill = b + 1, n
        else:
            fill += n
        bins[i] = b
    assert got == bins, (sizes, capacity)
