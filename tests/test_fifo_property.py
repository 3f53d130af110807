"""Property test for the FIFO prefix-sum closed form: on random ledgers,
the window-based fill must equal a literal sequential simulation of
draining the stock line by line — the definition the closed form claims
to replace. Runs the Spark expression once per hypothesis case on a
single-part ledger (cheap), exercising ties, exhaustion, and exact-fit
boundaries the real data may never hit."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window

STOCK = 50.0

qty = st.floats(min_value=0.25, max_value=30.0, allow_nan=False).map(
    lambda f: round(f * 4) / 4  # quarter-unit grid: exact in binary floats
)


def _simulate(quantities: list[float]) -> list[float]:
    remaining, fills = STOCK, []
    for q in quantities:
        take = max(0.0, min(q, remaining))
        fills.append(take)
        remaining -= take
    return fills


@given(st.lists(qty, min_size=1, max_size=12))
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_fifo_closed_form_equals_sequential_simulation(spark, quantities):
    rows = [(i, float(q)) for i, q in enumerate(quantities)]
    df = spark.createDataFrame(rows, "seq: int, qty: double")
    w = Window.orderBy("seq")
    cum_before = F.coalesce(
        F.sum("qty").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0.0)
    )
    filled = F.greatest(F.lit(0.0), F.least(F.col("qty"), F.lit(STOCK) - cum_before))
    got = [r.filled for r in df.select("seq", filled.alias("filled")).orderBy("seq").collect()]
    assert got == _simulate([q for _, q in rows])
