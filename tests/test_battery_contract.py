"""Battery output contract: driver-canonicalizer-safe schemas.

The driver canonicalizes each query result with a pandas ``sort_values``
over all columns and then hashes cells; list/dict cells are unhashable and
crash the check (round-1 q28 failure).  Rule: every battery query's output
schema is SCALARS ONLY — no array/map/struct columns.  Complex values that
matter to a query's semantics are serialized deterministically (e.g.
``array_join``) before they leave the query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from agentic_etl_poc_spark.queries import load_all
from tests.conftest import SF_SMOKE

ALL = load_all()

_COMPLEX = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


@pytest.mark.parametrize("name", sorted(ALL))
def test_output_schema_is_scalar_only(spark, name):
    df = ALL[name].fn(spark, SF_SMOKE)  # lazy: schema only, no job
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)]
    assert not bad, (
        f"{name}: complex-typed output columns {bad} — the driver's "
        "canonicalizer cannot sort/hash them; serialize to scalars "
        "(array_join / to_json) inside the query"
    )


@pytest.mark.parametrize("name", sorted(ALL))
def test_output_columns_unique(spark, name):
    df = ALL[name].fn(spark, SF_SMOKE)
    cols = df.columns
    assert len(cols) == len(set(cols)), f"{name}: duplicate output columns {cols}"
