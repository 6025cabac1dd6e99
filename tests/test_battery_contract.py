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


def test_sweep_order_covers_registry_exactly():
    """SWEEP_ORDER is load-bearing: the external correctness sweep records
    only the first ~50 entries per round, so every registered query must
    hold an explicit, unique sweep position (a new query silently appended
    by the load_all() safety net would land in an unconsidered slot)."""
    from agentic_etl_poc_spark.queries.core import SWEEP_ORDER

    assert len(SWEEP_ORDER) == len(set(SWEEP_ORDER)), "duplicate sweep slots"
    assert set(SWEEP_ORDER) == set(ALL), (
        "SWEEP_ORDER and the registry disagree; give every query an "
        "explicit slot in queries/core.py::SWEEP_ORDER"
    )
    assert list(ALL) == [n for n in SWEEP_ORDER if n in ALL]


def test_sweep_priority_block_leads():
    """The 16 queries still lacking a green driver CORRECTNESS row after
    round 2 must occupy the first 16 sweep slots (the sweep window is ~50
    rows; these cannot risk truncation)."""
    priority = {
        "d10_cluster_survivors",
        "q45_grouping_sets",
        "q46_ignore_nulls_fill",
        "q47_bitwise_agg",
        "q48_shipping_priority",
        "q49_latest_record_dedup",
        "q50_higher_order_funcs",
        "q51_salted_skew_agg",
        "q54_recursive_year_ladder",
        "q55_lateral_topn",
        "q56_local_supplier_volume",
        "s06_knn_join",
        "s07_int8_quantization",
        "q24_sessionize_batch",
        "t06_boilerplate_ratio",
        "q28_array_map_agg",
    }
    assert set(list(ALL)[:16]) == priority
