"""Guard rails on connected_components (ADVICE round-1 findings):
non-integral ids must raise instead of silently nulling, and an exhausted
iteration budget must be audible."""

import pandas as pd
import pytest

from pandas_sigproc_spark.operators.graph import connected_components


def test_string_ids_raise(spark):
    edges = spark.createDataFrame(
        pd.DataFrame({"src": ["a", "b"], "dst": ["b", "c"]})
    )
    with pytest.raises(TypeError, match="integral"):
        connected_components(edges)


def test_string_vertex_ids_raise(spark):
    edges = spark.createDataFrame(pd.DataFrame({"src": [1], "dst": [2]}))
    verts = spark.createDataFrame(pd.DataFrame({"id": ["x"]}))
    with pytest.raises(TypeError, match="vertices.id"):
        connected_components(edges, vertices=verts)


def test_exhausted_iterations_warn(spark):
    edges = spark.createDataFrame(
        pd.DataFrame({"src": [1, 2, 3, 4], "dst": [2, 3, 4, 5]})
    )
    with pytest.warns(RuntimeWarning, match="fixpoint"):
        # local_threshold=0 forces the iterative path the budget applies to
        connected_components(edges, max_iterations=1, local_threshold=0)


def test_converged_run_does_not_warn(spark):
    import warnings

    edges = spark.createDataFrame(pd.DataFrame({"src": [1, 2], "dst": [2, 3]}))
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = connected_components(edges).toPandas()
    assert set(out["component"]) == {1}


def test_null_endpoint_edges_dropped_both_paths(spark):
    # Half-edges (e.g. from an upstream outer join) constrain nothing;
    # they used to crash the single-task union-find (NaN after Arrow's
    # long-with-nulls -> float64) and emit junk rows on the iterative
    # path.  Both paths must now agree with the null-free result.
    pdf = pd.DataFrame({"src": [1, 2, None, 4], "dst": [2, 3, 5, None]})
    edges = spark.createDataFrame(pdf.astype({"src": "Int64", "dst": "Int64"}),
                                  "src long, dst long")
    clean = spark.createDataFrame(pd.DataFrame({"src": [1, 2], "dst": [2, 3]}))
    want = connected_components(clean).toPandas().sort_values("id", ignore_index=True)
    for thr in (0, 1_000_000):  # iterative and union-find paths
        got = (
            connected_components(edges, local_threshold=thr)
            .toPandas()
            .sort_values("id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want)
