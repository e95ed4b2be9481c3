"""http_post_sink: the reference's new-customer Web POST flow
(adf/pipeline.json:364-441) as an injectable-transport on_insert sink."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from azure_sales_etl_pipeline_spark.operators.scd2 import SCD2Table
from azure_sales_etl_pipeline_spark.operators.webhook import http_post_sink

URL = "https://example.invalid/welcome"


def recording_transport(log):
    def send(url, body, headers):
        log.append((url, json.loads(body.decode("utf-8")), dict(headers)))
        return 200

    return send


def test_posts_one_json_body_per_inserted_row(spark, tmp_path):
    """Two SCD2 runs: every INSERT row fans out as one POST with the
    reference's {name, email} body and JSON content type; UPDATE and
    NO CHANGE rows never post."""
    log = []
    state = {"now": dt.datetime(2024, 1, 1)}
    dim = SCD2Table(
        spark,
        str(tmp_path / "dim"),
        "id",
        clock=lambda: state["now"],
        on_insert=http_post_sink(URL, fields=("name", "email"), transport=recording_transport(log)),
    )

    def df(rows):
        return spark.createDataFrame(rows, "id int, name string, email string")

    dim.upsert(df([(1, "Alice", "a@x.com"), (2, "Bob", "b@x.com")]))
    assert [(u, b) for u, b, _ in log] == [
        (URL, {"name": "Alice", "email": "a@x.com"}),
        (URL, {"name": "Bob", "email": "b@x.com"}),
    ]
    assert all(h["Content-Type"] == "application/json" for _, _, h in log)

    # run 2: 1 changed (update), 1 new (insert) — only the insert posts
    state["now"] = dt.datetime(2024, 2, 1)
    log.clear()
    dim.upsert(df([(1, "Alice", "alice@y.com"), (3, "Cara", "c@x.com")]))
    assert [b for _, b, _ in log] == [{"name": "Cara", "email": "c@x.com"}]


def test_max_rows_guard(spark, tmp_path):
    """An insert set larger than max_rows raises instead of launching an
    unbounded driver-side HTTP storm."""
    log = []
    sink = http_post_sink(URL, fields=("name",), transport=recording_transport(log), max_rows=2)
    big = spark.createDataFrame([(i, f"n{i}") for i in range(5)], "id int, name string")
    with pytest.raises(RuntimeError, match="max_rows"):
        sink(big)


def test_custom_headers_merge_over_default(spark):
    log = []
    sink = http_post_sink(
        URL,
        fields=("name",),
        headers={"Authorization": "Bearer t"},
        transport=recording_transport(log),
    )
    sink(spark.createDataFrame([(1, "Ann")], "id int, name string"))
    (_, _, headers) = log[0]
    assert headers["Authorization"] == "Bearer t"
    assert headers["Content-Type"] == "application/json"
