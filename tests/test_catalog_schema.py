"""Catalog output-schema contract: every catalog entry must emit only
scalar (atomic) top-level columns.

The round driver canonicalizes results through pandas ``sort_values``
over all columns; ArrayType/MapType/StructType cells are unhashable
there (``TypeError: unhashable type: 'list'``), so any complex-typed
output column silently fails the correctness gate even when the values
match the oracle (round-2 p19/p25 regression). Complex values must be
exported as canonical strings (``F.array_join``; DuckDB
``array_to_string``) or exploded to rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etsd_time_series_database_spark.plans import catalog
from tests.conftest import SLOW_CATALOG, SF_SMOKE

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in SLOW_CATALOG else n
        for n in sorted(catalog())
    ],
)
def test_catalog_output_schema_is_scalar(spark, name):
    q = catalog()[name]
    schema = q.build(spark, SF_SMOKE).schema
    complex_cols = [
        f.name for f in schema.fields if isinstance(f.dataType, _COMPLEX)
    ]
    assert not complex_cols, (
        f"{name} emits complex-typed columns {complex_cols}; the driver's "
        "pandas canonicalizer cannot sort/hash them — export as "
        "array_join(...)/array_to_string(...) strings or explode to rows"
    )
