"""Service-map aggregation (hyperdx_spark/servicemap.py) vs hand-computed
span topologies + the reference's aggregateServiceMapData client-side fold
cases (useServiceMap.test.ts parity)."""

from pyspark.sql import functions as F

from hyperdx_spark.servicemap import aggregate_service_map, service_map

SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, service string,"
    " kind string, status_code string, duration double"
)


def _spans(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _by_key(rows):
    return {
        (r["server_service"], r["client_service"], r["is_node_level"]): r
        for r in rows
    }


def test_edges_and_node_rollup(spark):
    rows = [
        # trace t1: web (client span c1) -> api (server span s1)
        ("t1", "c1", None, "web", "Client", "OK", 1.0),
        ("t1", "s1", "c1", "api", "Server", "OK", 10.0),
        # trace t1: api (client span c2, child of s1) -> db (server span s2)
        ("t1", "c2", "s1", "api", "Client", "OK", 2.0),
        ("t1", "s2", "c2", "db", "Server", "Error", 30.0),
        # trace t2: uninstrumented caller -> api (root server span)
        ("t2", "s3", None, "api", "Server", "Error", 20.0),
    ]
    out = service_map(_spans(spark, rows), exact=True).collect()
    got = _by_key(out)
    # edge web->api: 1 request, 0 errors
    e = got[("api", "web", False)]
    assert (e["request_count"], e["error_count"]) == (1, 0)
    assert e["p50"] == 10.0
    # edge api->db: 1 request, 1 error
    e = got[("db", "api", False)]
    assert (e["request_count"], e["error_count"]) == (1, 1)
    # uninstrumented caller: client_service NULL edge row survives (left join)
    e = got[("api", None, False)]
    assert (e["request_count"], e["error_count"]) == (1, 1)
    # node rollups cover ALL server spans of the service
    n = got[("api", None, True)]
    assert (n["request_count"], n["error_count"]) == (2, 1)
    assert n["p50"] == 15.0  # exact percentile over {10, 20}
    n = got[("db", None, True)]
    assert (n["request_count"], n["error_count"]) == (1, 1)
    # no 'web' node: web has no Server spans
    assert ("web", None, True) not in got


def test_self_loops_dropped_and_consumer_producer_kinds(spark):
    rows = [
        # same-service client->server pair: excluded (self loop)
        ("t1", "c1", None, "api", "Producer", "OK", 1.0),
        ("t1", "s1", "c1", "api", "Consumer", "OK", 5.0),
        # Producer/Consumer kinds participate like Client/Server
        ("t2", "c2", None, "worker", "SPAN_KIND_PRODUCER", "OK", 1.0),
        ("t2", "s2", "c2", "queue", "SPAN_KIND_CONSUMER", "OK", 7.0),
    ]
    got = _by_key(service_map(_spans(spark, rows), exact=True).collect())
    # the reference's WHERE drops self-loop rows before grouping, so the
    # same-service pair contributes NO rows (edge or node) at all
    assert not any(k[0] == "api" for k in got)
    assert got[("queue", "worker", False)]["request_count"] == 1
    assert got[("queue", None, True)]["request_count"] == 1


def test_sampling_predicate_and_factor_scaling(spark):
    rows = []
    for t in range(10):
        rows += [
            (f"t{t}", f"c{t}", None, "web", "Client", "OK", 1.0),
            (f"t{t}", f"s{t}", f"c{t}", "api", "Server",
             "Error" if t % 2 else "OK", float(t)),
        ]
    # keep traces 0,2,..,8 deterministically; counts scale back up by 2
    pred = F.col("trace_id").isin(*[f"t{t}" for t in range(0, 10, 2)])
    got = _by_key(
        service_map(
            _spans(spark, rows), sampling_factor=2, sample_predicate=pred,
            exact=True,
        ).collect()
    )
    e = got[("api", "web", False)]
    assert e["request_count"] == 10  # 5 sampled * factor 2
    assert e["error_count"] == 0  # even traces are OK


def test_service_name_filter(spark):
    rows = [
        ("t1", "c1", None, "web", "Client", "OK", 1.0),
        ("t1", "s1", "c1", "api", "Server", "OK", 2.0),
        ("t2", "c2", None, "cron", "Client", "OK", 1.0),
        ("t2", "s2", "c2", "db", "Server", "OK", 3.0),
    ]
    got = _by_key(
        service_map(
            _spans(spark, rows), exact=True, service_names=["api"]
        ).collect()
    )
    assert ("api", "web", False) in got
    assert all(k[0] == "api" for k in got)


def test_aggregate_service_map_fold(spark):
    """useServiceMap.test.ts: node-level row is the rolled-up total (no
    client summing); edges fill per-client stats and the client's outgoing."""
    rows = [
        {"server_service": "api", "client_service": None, "is_node_level": True,
         "request_count": 150, "error_count": 15, "p50": 1.0, "p95": 2.0, "p99": 3.0},
        {"server_service": "api", "client_service": "web", "is_node_level": False,
         "request_count": 100, "error_count": 10, "p50": 1.0, "p95": 2.0, "p99": 3.0},
        {"server_service": "api", "client_service": "worker", "is_node_level": False,
         "request_count": 50, "error_count": 5, "p50": 1.0, "p95": 2.0, "p99": 3.0},
    ]
    services = aggregate_service_map(rows)
    api = services["api"]
    assert api["incoming"]["total_requests"] == 150
    assert api["incoming"]["error_count"] == 15
    assert api["incoming"]["error_percentage"] == 10.0
    assert set(api["incoming_by_client"]) == {"web", "worker"}
    # clients get outgoing traffic and appear as nodes even without servers
    assert services["web"]["outgoing"] == 100
    assert services["worker"]["outgoing"] == 50
    assert aggregate_service_map([]) == {}
