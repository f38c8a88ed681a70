"""REST source over a real HTTP socket: a local server pages out records
(and throttles with 429 + Retry-After once), the adapter paginates with
backoff, and the result lands in a DataFrame — S7/S8 end-to-end without
leaving the machine."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse
from urllib.request import urlopen
from urllib.error import HTTPError

import pytest

from etl_pipeline_old_spark.sources.rest import TransportError, rest_to_dataframe

N_ROWS = 250
PAGE = 100


class _Api(BaseHTTPRequestHandler):
    throttled_once = False

    def do_GET(self):
        q = parse_qs(urlparse(self.path).query)
        offset = int(q.get("offset", ["0"])[0])
        limit = int(q.get("limit", ["100"])[0])
        # throttle exactly one request to exercise Retry-After handling
        if offset == PAGE and not _Api.throttled_once:
            _Api.throttled_once = True
            self.send_response(429)
            self.send_header("Retry-After", "0.01")
            self.end_headers()
            return
        rows = [
            {"id": i, "name": f"задача {i}"} for i in range(offset, min(offset + limit, N_ROWS))
        ]
        body = json.dumps(rows).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def api_url():
    _Api.throttled_once = False
    srv = HTTPServer(("127.0.0.1", 0), _Api)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _http_fetch(base_url):
    def fetch(offset: int, limit: int) -> list[dict]:
        try:
            with urlopen(f"{base_url}/tasks?offset={offset}&limit={limit}") as r:
                return json.loads(r.read())
        except HTTPError as e:
            retry_after = e.headers.get("Retry-After")
            raise TransportError(e.code, float(retry_after) if retry_after else None)

    return fetch


def test_rest_source_over_real_http(spark, api_url):
    df = rest_to_dataframe(
        spark, _http_fetch(api_url), schema="id long, name string", limit=PAGE
    )
    rows = sorted(r["id"] for r in df.collect())
    assert rows == list(range(N_ROWS))
    assert _Api.throttled_once, "the 429 path must have been exercised"
    # Cyrillic payloads survive the trip
    assert df.filter("id = 7").first()["name"] == "задача 7"
