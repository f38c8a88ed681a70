"""Offline adapter tests for authenticated single-shot REST sources."""

from __future__ import annotations


def test_metrika_counters_oauth_adapter(spark):
    from etl_pipeline_old_spark.sources.rest import metrika_counters, oauth_headers

    seen = {}

    def transport(url, headers):
        seen["url"] = url
        seen["headers"] = headers
        return [
            {"id": 1, "name": "сайт-1", "site": "a.example"},
            {"id": 2, "name": "сайт-2", "site": "b.example"},
        ]

    df = metrika_counters(spark, transport, token="test-token")
    assert seen["headers"] == oauth_headers("test-token")
    assert "api-metrika" in seen["url"]
    rows = {r.counter_id: r.name for r in df.collect()}
    assert rows == {1: "сайт-1", 2: "сайт-2"}
