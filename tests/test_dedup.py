

def test_connected_components_rejects_string_ids(spark):
    """cast('long') on string edge ids silently empties the edge set;
    the operator must fail loudly instead (hash string ids first)."""
    import pytest

    from nextbus2pg_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [("doc-1", "doc-2")], "id_a string, id_b string"
    )
    with pytest.raises(TypeError, match="integral"):
        connected_components(edges)
