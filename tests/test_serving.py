"""S3 serving-layer integration: queries cross a real network boundary
(TCP wire protocol + HTTP JSON) into Spark-backed lookups."""

import json
import pickle
import socket
import struct
import urllib.parse
import urllib.request

import pytest

from kenshin_spark.config import Schema
from kenshin_spark.serving import CacheQueryServer, HttpFetchServer, cache_query
from kenshin_spark.store import ParquetTieredStore

SCHEMA = Schema.from_strings(
    "s", ".*", "60s:1d,300s:7d", xff=1.0, agg_method="average"
)


@pytest.fixture()
def store(spark, tmp_path):
    st = ParquetTieredStore(spark, SCHEMA, str(tmp_path / "st"))
    st.overwrite(
        0,
        spark.createDataFrame(
            [("sys.cpu", 60, 1.0), ("sys.cpu", 120, 2.0), ("sys.mem", 60, 9.0)],
            ["metric", "ts", "value"],
        ),
    )
    return st


class TestCacheQueryServer:
    def test_wire_roundtrip_against_spark(self, spark, store):
        def lookup(metric):
            return [
                (r["ts"], r["value"])
                for r in store.read(0).where(f"metric = '{metric}'").collect()
            ]

        srv = CacheQueryServer(lookup)
        host, port = srv.start()
        try:
            got = cache_query(host, port, "sys.cpu")
            assert sorted(got) == [(60, 1.0), (120, 2.0)]
            assert cache_query(host, port, "ghost") == []
        finally:
            srv.stop()

    def test_malicious_request_dropped_server_survives(self, spark):
        srv = CacheQueryServer(lambda m: [(1, 1.0)])
        host, port = srv.start()
        try:
            class Evil:
                def __reduce__(self):
                    import os

                    return (os.system, ("echo pwned",))

            with socket.create_connection((host, port)) as s:
                payload = pickle.dumps(Evil())
                s.sendall(struct.pack("!L", len(payload)) + payload)
                # server refuses the global lookup and drops the conn
                assert s.recv(4) == b""
            # a well-formed request still works afterwards
            assert cache_query(host, port, "m") == [(1, 1.0)]
        finally:
            srv.stop()


class TestHttpFetchServer:
    def test_fetch_over_http(self, spark, store):
        def fetch_fn(metrics, frm, until, now):
            df = store.fetch(metrics, frm, until, now)
            return (
                []
                if df is None
                else [(r["metric"], r["ts"], r["value"]) for r in df.collect()]
            )

        srv = HttpFetchServer(fetch_fn, hot_fn=lambda m: [(5, 1.5)])
        host, port = srv.start()
        try:
            with urllib.request.urlopen(
                f"http://{host}:{port}/fetch?metric=sys.cpu&from=60&until=180&now=200"
            ) as resp:
                body = json.load(resp)
            rows = {(m, t): v for m, t, v in body["rows"]}
            assert rows[("sys.cpu", 60)] == 1.0
            assert rows[("sys.cpu", 120)] == 2.0

            with urllib.request.urlopen(
                f"http://{host}:{port}/hot?metric=x"
            ) as resp:
                assert json.load(resp)["datapoints"] == [[5, 1.5]]

            with pytest.raises(urllib.error.HTTPError):
                urllib.request.urlopen(f"http://{host}:{port}/fetch")
        finally:
            srv.stop()

    def test_engine_error_returns_500_not_dropped_connection(self, spark):
        """A non-client error raised by the wired fn (e.g. a Spark
        analysis failure during fetch/collect) must come back as an
        HTTP 500, not a dropped connection."""
        def boom(*a):
            raise RuntimeError("engine exploded")

        srv = HttpFetchServer(boom, render_fn=boom)
        host, port = srv.start()
        try:
            for path in (
                "/fetch?metric=m&from=0&until=1&now=1",
                "/render?target=x&from=0&until=1&now=1",
            ):
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(f"http://{host}:{port}{path}")
                assert ei.value.code == 500
        finally:
            srv.stop()


class TestHttpRender:
    def test_render_target_over_http(self, spark, store):
        from kenshin_spark.serving import store_render_fn

        srv = HttpFetchServer(
            lambda *a: [], render_fn=store_render_fn(store)
        )
        host, port = srv.start()
        try:
            url = (
                f"http://{host}:{port}/render?"
                + urllib.parse.urlencode(
                    {"target": "scale(sys.*,2)", "from": 60,
                     "until": 180, "now": 200}
                )
            )
            with urllib.request.urlopen(url) as resp:
                body = json.load(resp)
            rows = {(m, t): v for m, t, v in body["rows"]}
            assert rows[("sys.cpu", 60)] == 2.0   # 1.0 scaled by 2
            assert rows[("sys.cpu", 120)] == 4.0  # 2.0 scaled by 2

            # no render_fn wired → 404 (the default server shape)
            bare = HttpFetchServer(lambda *a: [])
            h2, p2 = bare.start()
            try:
                with pytest.raises(urllib.error.HTTPError):
                    urllib.request.urlopen(
                        f"http://{h2}:{p2}/render?target=x&from=0&until=1&now=1"
                    )
            finally:
                bare.stop()
        finally:
            srv.stop()
