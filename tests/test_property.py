"""Property-based tests (hypothesis) for the composite operators whose
edge cases are easy to miss with fixtures: as-of join vs pandas
merge_asof, connected components vs a pure-Python union-find.

Spark jobs per example are expensive — example counts are small but the
generated shapes cover the hazardous regimes (empty right side, all-equal
timestamps, chain graphs, self-contained cliques)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st


@st.composite
def asof_case(draw):
    n_l = draw(st.integers(1, 60))
    n_r = draw(st.integers(0, 60))
    n_keys = draw(st.integers(1, 5))
    # small timestamp domain forces exact-ts ties between and within sides
    t_domain = draw(st.integers(3, 40))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    lp = pd.DataFrame({
        "id": np.arange(n_l),
        "k": rng.integers(0, n_keys, n_l),
        "t": rng.integers(0, t_domain, n_l).astype("int64"),
    })
    rp = pd.DataFrame({
        "k": rng.integers(0, n_keys, max(n_r, 1))[:n_r],
        "t": rng.integers(0, t_domain, max(n_r, 1))[:n_r].astype("int64"),
        "v": np.round(rng.uniform(0, 10, max(n_r, 1))[:n_r], 3),
    })
    rp = rp.groupby(["k", "t"], as_index=False)["v"].max()
    return lp, rp


class TestAsofProperty:
    @settings(max_examples=8, deadline=None)
    @given(asof_case())
    def test_matches_merge_asof(self, case):
        from .conftest import get_session

        spark = get_session()
        from i3dm_export_spark.operators.asof import asof_join_backward

        lp, rp = case
        if len(rp):
            expected = pd.merge_asof(
                lp.sort_values("t", kind="mergesort"),
                rp.sort_values("t", kind="mergesort"),
                on="t", by="k", direction="backward",
            ).sort_values("id").reset_index(drop=True)
        else:
            expected = lp.sort_values("id").reset_index(drop=True).assign(v=np.nan)
        rdf = (
            spark.createDataFrame(rp)
            if len(rp)
            else spark.createDataFrame([], "k long, t long, v double")
        )
        out = (
            asof_join_backward(
                spark.createDataFrame(lp), rdf,
                on=["k"], left_ts="t", right_ts="t", value_cols=["v"],
            )
            .toPandas().sort_values("id").reset_index(drop=True)
        )
        assert len(out) == len(lp)
        assert np.allclose(
            out["v"].to_numpy(dtype=float),
            expected["v"].to_numpy(dtype=float),
            equal_nan=True,
        )


def _union_find_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


class TestComponentsProperty:
    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
                lambda p: p[0] != p[1]
            ),
            min_size=1, max_size=40,
        )
    )
    def test_matches_union_find(self, edges):
        from .conftest import get_session

        spark = get_session()
        from i3dm_export_spark.operators.dedup import connected_components

        pairs = [(min(a, b), max(a, b)) for a, b in edges]
        expected = _union_find_components(pairs)
        pdf = pd.DataFrame(pairs, columns=["a", "b"]).drop_duplicates()
        got = {
            r["node"]: r["comp"]
            for r in connected_components(
                spark.createDataFrame(pdf)
            ).collect()
        }
        assert got == expected
