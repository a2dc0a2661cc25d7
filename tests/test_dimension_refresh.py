"""End-to-end dimension-refresh tests (SURVEY.md §3 entry point 2):
routeConfig XML → routes/services/stops/stop_orders with missing-stop
repair, sentinel services, key stability across refreshes, idempotent
stop orders."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nextbus2pg_spark.pipelines.dimension_refresh import (
    DimensionStore,
    run_refresh,
)
from nextbus2pg_spark.sources.route_config import RouteConfig

ROUTE_CONFIG_38R = """<?xml version="1.0"?>
<body>
  <route tag="38R" title="38R Geary Rapid">
    <stop tag="s1" title="Geary &amp; 33rd" lon="-122.49" lat="37.78"/>
    <stop tag="s2" title="Geary &amp; Park" lon="-122.47" lat="37.78"/>
    <direction tag="38R_out" title="Outbound" name="Outbound" useForUI="true">
      <stop tag="s1"/>
      <stop tag="s2"/>
      <stop tag="ghost"/>
    </direction>
    <direction tag="38R_in" title="Inbound" name="Inbound" useForUI="false">
      <stop tag="s2"/>
      <stop tag="s1"/>
    </direction>
  </route>
</body>
"""

ROUTE_CONFIG_1 = """<?xml version="1.0"?>
<body>
  <route tag="1" title="1 California">
    <stop tag="ghost" title="Clay &amp; Drumm" lon="-122.396" lat="37.795"/>
    <stop tag="c2" title="Sacramento &amp; Davis" lon="-122.398" lat="37.794"/>
    <direction tag="1_out" title="Outbound" name="Outbound" useForUI="true">
      <stop tag="ghost"/>
      <stop tag="c2"/>
    </direction>
  </route>
</body>
"""


def _inputs(spark):
    cfg = RouteConfig()
    cfg.add_document("38R", ROUTE_CONFIG_38R)
    cfg.add_document("1", ROUTE_CONFIG_1)
    body, dirs, dstops = cfg.to_dataframes(spark)
    route_list = spark.createDataFrame(
        [("38R", "38R Geary Rapid"), ("1", "1 California")],
        "tag string, title string",
    )
    return route_list, body, dirs, dstops


def test_full_refresh_end_to_end(spark, tmp_path):
    store = DimensionStore(spark, str(tmp_path / "dims"))
    route_list, body, dirs, dstops = _inputs(spark)
    ts = dt.datetime(2024, 1, 15, 8, 0, 0)
    run_refresh(store, route_list, body, dirs, dstops, "sf-muni", ts)

    routes = {r.tag: r for r in store.route.read().collect()}
    assert set(routes) == {"38R", "1"}

    services = store.service.read().collect()
    by_route_tag = {}
    for s in services:
        by_route_tag.setdefault(s.route_id, []).append(s.tag)
    # 2 directions + sentinel for 38R; 1 direction + sentinel for 1.
    assert sorted(
        by_route_tag[routes["38R"].route_id], key=lambda x: (x is None, x)
    ) == ["38R_in", "38R_out", None]
    assert sorted(
        by_route_tag[routes["1"].route_id], key=lambda x: (x is None, x)
    ) == ["1_out", None]

    stops = store.stop.read().collect()
    stops_38r = [s for s in stops if s.route_id == routes["38R"].route_id]
    ghost = [s for s in stops_38r if s.tag == "ghost"]
    # Missing-stop repair: 'ghost' has no body stop on 38R but one on
    # route 1 → borrowed name+location (agency.py:141-170 semantics).
    assert len(ghost) == 1
    assert ghost[0].name == "Clay & Drumm"
    assert abs(ghost[0].location.lon - (-122.396)) < 1e-9

    orders = store.service_stop_order.read().collect()
    svc_out = [
        s.service_id for s in services
        if s.route_id == routes["38R"].route_id and s.tag == "38R_out"
    ][0]
    out_orders = sorted(
        [o for o in orders if o.service_id == svc_out],
        key=lambda o: o.stop_order,
    )
    assert [o.stop_order for o in out_orders] == [1, 2, 3]  # W1 gapless
    assert all(o.update_timestamp == ts for o in out_orders)


def test_refresh_twice_key_stability_and_idempotence(spark, tmp_path):
    store = DimensionStore(spark, str(tmp_path / "dims"))
    route_list, body, dirs, dstops = _inputs(spark)
    ts = dt.datetime(2024, 1, 15, 8, 0, 0)
    run_refresh(store, route_list, body, dirs, dstops, "sf-muni", ts)
    ids_before = {
        (r.agency_id, r.tag): r.route_id for r in store.route.read().collect()
    }
    n_orders = store.service_stop_order.read().count()

    # Second refresh, same day: renamed route, same business keys.
    route_list2 = spark.createDataFrame(
        [("38R", "38R Geary RAPID v2"), ("1", "1 California")],
        "tag string, title string",
    )
    run_refresh(store, route_list2, body, dirs, dstops, "sf-muni", ts)

    after = {r.tag: r for r in store.route.read().collect()}
    assert after["38R"].route_id == ids_before[("sf-muni", "38R")]  # K2
    assert after["38R"].name == "38R Geary RAPID v2"  # payload updated
    assert store.service_stop_order.read().count() == n_orders  # K5 no-op
    # NULL-tag sentinels did not duplicate (K3 null-safe key).
    nulls = store.service.read().where(F.col("tag").isNull()).count()
    assert nulls == 2

    # Next-day snapshot: stop orders re-recorded under the new timestamp.
    ts2 = dt.datetime(2024, 1, 16, 8, 0, 0)
    run_refresh(store, route_list2, body, dirs, dstops, "sf-muni", ts2)
    assert store.service_stop_order.read().count() == 2 * n_orders


def test_agency_bootstrap_and_retry(spark, tmp_path):
    """Entry point 3 (K1) + T6 retry; final failure re-raises (the
    reference swallows it — documented fix)."""
    import pytest
    from nextbus2pg_spark.pipelines.dimension_refresh import (
        make_agency_table,
        refresh_agencies,
        with_retries,
    )

    t = make_agency_table(spark, str(tmp_path / "dims"))
    batch = spark.createDataFrame(
        [("sf-muni", "SF Muni", "California")],
        "tag string, title string, regionTitle string",
    )
    refresh_agencies(t, batch)
    batch2 = spark.createDataFrame(
        [("sf-muni", "SF Muni v2", "California"),
         ("actransit", "AC Transit", "California")],
        "tag string, title string, regionTitle string",
    )
    refresh_agencies(t, batch2)
    rows = {r.agency_id: r.name for r in t.read().collect()}
    assert rows == {"sf-muni": "SF Muni v2", "actransit": "AC Transit"}

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("api down")
        return "ok"

    assert with_retries(flaky, n_tries=10) == "ok"
    assert len(calls) == 3

    with pytest.raises(RuntimeError):
        with_retries(lambda: (_ for _ in ()).throw(RuntimeError("x")), n_tries=2)
