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


SWEEP_WINDOW = 50  # rows the external correctness sweep records per round


def _correctness_files():
    """CORRECTNESS_r*.json paths sorted by INTEGER round number (a plain
    lexicographic sort would rank r100 < r99)."""
    import glob
    import os
    import re

    from tests.conftest import REPO_ROOT

    def round_no(path):
        return int(re.search(r"_r(\d+)\.json$", path).group(1))

    return sorted(
        glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")), key=round_no
    )


def test_sweep_priority_block_leads():
    """Rotation invariant, recomputed from the recorded sweeps so it goes
    red the moment a new CORRECTNESS_r{N}.json lands (rotating SWEEP_ORDER
    is then the next round's first task — this red is the signal, not a
    product bug).  Invariant: with `stale` = entries lacking a green row
    in the LATEST sweep (never-sampled entries count as stale), the first
    min(50, len(stale)) slots must all be stale — no window slot may be
    burned on an entry that is already freshly green — and never-sampled
    entries (which have waited the longest) must all sit inside the
    window, with any entry recorded RED in the latest sweep at the very
    front."""
    import json

    files = _correctness_files()
    assert files, "no CORRECTNESS files — nothing to rotate against"
    latest = json.load(open(files[-1]))
    latest_green = {
        n
        for n, row in latest.items()
        if row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match") is not False
    }
    latest_red = set(latest) - latest_green
    ever_recorded = set()
    for path in files:
        ever_recorded |= set(json.load(open(path)))

    stale = set(ALL) - latest_green
    never_sampled = set(ALL) - ever_recorded
    n_window = min(SWEEP_WINDOW, len(stale))
    window = list(ALL)[:n_window]
    wasted = [n for n in window if n not in stale]
    assert not wasted, (
        f"sweep window wastes slots on freshly-green entries {wasted}; "
        f"rotate queries/core.py::SWEEP_ORDER (this test going red right "
        f"after a new CORRECTNESS file lands is the designed tripwire)"
    )
    # red-in-latest entries are regressions — they must lead, never risk
    # truncation at the window tail
    reds_in_battery = latest_red & set(ALL)
    assert set(list(ALL)[: len(reds_in_battery)]) == reds_in_battery, (
        f"entries red in the latest sweep {sorted(reds_in_battery)} must "
        f"lead SWEEP_ORDER"
    )
    missing_new = never_sampled - set(window)
    assert len(never_sampled) > n_window or not missing_new, (
        f"never-driver-sampled entries {sorted(missing_new)} must sit "
        f"inside the sweep window — they have waited longest for a row"
    )
