"""The local correctness gate: every registered query with an oracle is
hash-compared against DuckDB at sf0.001, mirroring the driver's t2
check (row count + column names + order-insensitive values)."""

import duckdb
import pytest

from tools.check_oracle import norm_rows
from tmp_parquet_merge_spark.queries import REGISTRY
from tmp_parquet_merge_spark.registry import register_duckdb_views

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    register_duckdb_views(con, sf_dir)
    return con


def _assert_driver_hashable(name, schema):
    """The per-round driver canonicalizes results through a pandas
    sort_values, which raises ``unhashable type`` on array/map/struct
    cells (q_agg_collect r2, q_multimodal_features r3).  Registered
    outputs must therefore be flat scalar columns — serialize nested
    values (array_join / to_json) before registering."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for f in schema.fields:
        assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
            f"{name}.{f.name} is {f.dataType.simpleString()}: nested types "
            "crash the driver canonicalizer — serialize to a string"
        )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, duck, name):
    q = REGISTRY[name]
    sdf = q.build(spark, sf_dir)
    _assert_driver_hashable(name, sdf.schema)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert norm_rows(scols, srows) == norm_rows(ocols, orows)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = REGISTRY[name].build(spark, sf_dir)
    _assert_driver_hashable(name, df.schema)
    assert df.count() >= 0 and len(df.schema.fields) > 0
