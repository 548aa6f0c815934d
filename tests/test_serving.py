"""S3 serving-layer integration: queries cross a real network boundary
(TCP wire protocol + HTTP JSON) into Spark-backed lookups."""

import json
import pickle
import socket
import struct
import urllib.parse
import urllib.request

import pytest
from pyspark.sql import functions as F

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

    def test_hot_surfaces_degraded_flag(self):
        """ADVICE r9: /hot must carry the per-request degraded marker
        exactly like /fetch and /render — a flag-aware hot_fn that
        degrades past its validation budget may not leave the client
        blind."""

        def hot_fn(metric, flags: dict | None = None):
            if flags is not None:
                flags["degraded"] = True
            return [(5, 1.5)]

        srv = HttpFetchServer(lambda *a: [], hot_fn=hot_fn)
        host, port = srv.start()
        try:
            with urllib.request.urlopen(
                f"http://{host}:{port}/hot?metric=x"
            ) as resp:
                body = json.load(resp)
            assert body["datapoints"] == [[5, 1.5]]
            assert body["degraded"] is True

            # a plain (flag-unaware) hot_fn keeps the old body shape
            bare = HttpFetchServer(lambda *a: [], hot_fn=lambda m: [(5, 1.5)])
            h2, p2 = bare.start()
            try:
                with urllib.request.urlopen(
                    f"http://{h2}:{p2}/hot?metric=x"
                ) as resp:
                    b2 = json.load(resp)
                assert "degraded" not in b2
            finally:
                bare.stop()
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


class TestConcurrentServingDuringWrites:
    """The reference daemon answers cache queries WHILE the writer
    thread flushes (rurouni/protocols.py:65-84 against writer.py's
    writeForever loop). Spark analog: TCP cache queries and HTTP
    fetches keep landing — across a real network boundary, from many
    client threads — while ``StreamingIngest.process_batch`` commits
    micro-batches into the same mor store. Every response must be
    well-formed and value-correct for whatever prefix of batches it
    observed; nothing may error or hang."""

    def test_concurrent_queries_mid_process_batch(self, spark, tmp_path):
        import threading
        import urllib.request

        from kenshin_spark.config import SchemaSet
        from kenshin_spark.streaming import StreamingIngest

        schema = Schema.from_strings(
            "c", ".*", "60s:1d,300s:7d", xff=1.0, agg_method="max"
        )
        now = 86_400 * 10
        ing = StreamingIngest(
            spark,
            SchemaSet((schema,)),
            str(tmp_path / "root"),
            clock=lambda: now,
            store_mode="mor",
        )

        def batch_points(b: int):
            # batch b writes 8 slots per metric at disjoint, aligned ts;
            # value encodes (batch, slot) so any response is checkable
            rows = [
                (m, now - 7200 + 60 * (8 * b + j), float(100 * b + j), now)
                for m in ("srv.a", "srv.b")
                for j in range(8)
            ]
            return spark.createDataFrame(
                rows, "metric string, ts long, value double, arrival long"
            )

        expected = {}  # (metric, ts) -> value over ALL batches
        n_batches = 4
        for b in range(n_batches):
            for r in batch_points(b).collect():
                expected[(r["metric"], r["ts"])] = r["value"]

        ing.process_batch(batch_points(0), 0)  # store exists pre-serve
        store = ing.store_for(schema)

        def lookup(metric):
            return [
                (r["ts"], r["value"])
                for r in store.read(0).where(
                    F.col("metric") == metric
                ).collect()
            ]

        def fetch_fn(metrics, frm, until, now_):
            df = store.fetch(metrics, frm, until, now_)
            return (
                []
                if df is None
                else [
                    (r["metric"], r["ts"], r["value"]) for r in df.collect()
                ]
            )

        tcp = CacheQueryServer(lookup)
        http = HttpFetchServer(fetch_fn)
        th, tp = tcp.start()
        hh, hp = http.start()
        writer_done = threading.Event()
        errors: list = []
        responses: list = []
        lock = threading.Lock()

        def writer():
            try:
                for b in range(1, n_batches):
                    ing.process_batch(batch_points(b), b)
            except Exception as exc:  # pragma: no cover
                errors.append(("writer", exc))
            finally:
                writer_done.set()

        def tcp_client(metric):
            while True:
                stop = writer_done.is_set()
                try:
                    got = cache_query(th, tp, metric)
                    with lock:
                        responses.append(("tcp", metric, got))
                except Exception as exc:
                    errors.append(("tcp", exc))
                    return
                if stop:
                    return

        def http_client(metric):
            url = (
                f"http://{hh}:{hp}/fetch?metric={metric}"
                f"&from={now - 7200}&until={now}&now={now}"
            )
            while True:
                stop = writer_done.is_set()
                try:
                    with urllib.request.urlopen(url, timeout=60) as resp:
                        body = json.load(resp)
                    with lock:
                        responses.append(("http", metric, body["rows"]))
                except Exception as exc:
                    errors.append(("http", exc))
                    return
                if stop:
                    return

        threads = [threading.Thread(target=writer)]
        for m in ("srv.a", "srv.b"):
            threads += [
                threading.Thread(target=tcp_client, args=(m,)),
                threading.Thread(target=http_client, args=(m,)),
            ]
        try:
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=300)
            assert not any(t.is_alive() for t in threads), "hung thread"
            assert not errors, errors

            # every mid-write response is value-correct for its keys
            n_checked = 0
            for kind, metric, rows in responses:
                if kind == "tcp":
                    for ts, v in rows:
                        assert expected[(metric, ts)] == v
                        n_checked += 1
                else:
                    for m, ts, v in rows:
                        if v is not None:  # fetch grid NULL-pads
                            assert expected[(m, ts)] == v
                            n_checked += 1
            assert n_checked > 0

            # post-write: both surfaces see ALL batches
            final = dict(cache_query(th, tp, "srv.a"))
            want = {
                ts: v for (m, ts), v in expected.items() if m == "srv.a"
            }
            assert final == want
            got_http = {
                (m, ts): v
                for m, ts, v in fetch_fn(["srv.b"], now - 7200, now, now)
                if v is not None
            }
            assert got_http == {
                (m, ts): v for (m, ts), v in expected.items() if m == "srv.b"
            }
        finally:
            tcp.stop()
            http.stop()


class TestSwapSeqlock:
    """The store's filesystem seqlock (store.swap_epoch /
    consistent_read): plain parquet has no snapshot isolation, so a
    serving read racing a compaction day-swap can fail FAILED_READ_FILE
    mid-scan or silently read the between-renames gap. The seqlock makes
    every destructive transition observable; consistent_read retries
    around it. (On Delta/Iceberg this degenerates to a plain read —
    fs.py's documented production swap.)"""

    def _mk(self, spark, tmp_path, mode="mor"):
        # seqlock semantics under test — pin the backend (fresh roots
        # default to the manifest log since r11)
        st = ParquetTieredStore(spark, SCHEMA, str(tmp_path / "sl"),
                                mode=mode, commit_protocol="seqlock")
        st.upsert(
            0,
            spark.createDataFrame(
                [("m.a", 60 * j, float(j)) for j in range(1, 9)],
                ["metric", "ts", "value"],
            ),
        )
        return st

    def test_epoch_even_after_every_destructive_op(self, spark, tmp_path):
        st = self._mk(spark, tmp_path)
        assert st.swap_epoch() % 2 == 0
        e0 = st.swap_epoch()
        st.compact(0, days=[0])  # per-day double-rename swap
        e1 = st.swap_epoch()
        assert e1 % 2 == 0 and e1 > e0
        st.compact(0)  # full-tier swap
        e2 = st.swap_epoch()
        assert e2 % 2 == 0 and e2 > e1
        st.delete_metrics(["m.a"])
        e3 = st.swap_epoch()
        assert e3 % 2 == 0 and e3 > e2

    def test_expire_bumps_only_when_something_dropped(self, spark, tmp_path):
        st = self._mk(spark, tmp_path)
        e0 = st.swap_epoch()
        st.expire(now=120)  # retention 1d → nothing old enough
        assert st.swap_epoch() == e0
        st.expire(now=86_400 * 400)  # everything expired
        assert st.swap_epoch() > e0 and st.swap_epoch() % 2 == 0

    def test_consistent_read_retries_stale_then_returns(self, spark, tmp_path):
        st = self._mk(spark, tmp_path)
        calls = []

        def flaky():
            calls.append(1)
            if len(calls) == 1:
                raise RuntimeError(
                    "[FAILED_READ_FILE.FILE_NOT_EXIST] gone mid-swap"
                )
            return 42

        assert st.consistent_read(flaky) == 42
        assert len(calls) == 2
        assert st.read_retry_stats["stale_retries"] == 1  # observable

        def broken():
            raise ValueError("real engine bug — must propagate")

        import pytest as _pytest

        with _pytest.raises(ValueError):
            st.consistent_read(broken)

    def test_consistent_read_rejects_epoch_race(self, spark, tmp_path):
        st = self._mk(spark, tmp_path)
        seen = []

        def racy():
            seen.append(1)
            if len(seen) == 1:  # a swap committed mid-read → must retry
                with st._swap_guard():
                    pass
            return len(seen)

        assert st.consistent_read(racy) == 2
        assert st.read_retry_stats["epoch_races"] == 1
        assert st.read_retry_stats["degraded_returns"] == 0

    def test_consistent_read_waits_out_inflight_swap(self, spark, tmp_path):
        import threading
        import time as _t

        st = self._mk(spark, tmp_path)
        release = threading.Event()

        def long_swap():
            with st._swap_guard():
                release.set()
                _t.sleep(0.4)

        t = threading.Thread(target=long_swap)
        t.start()
        release.wait(5)
        # store object is shared with the writer thread; read through a
        # READER-side store handle so in-process nesting isn't consulted
        reader = ParquetTieredStore(spark, SCHEMA, st.root, mode="mor")
        assert reader.swap_epoch() % 2 == 1  # in flight right now
        out = reader.consistent_read(lambda: reader.swap_epoch() % 2)
        t.join()
        assert out == 0  # the returned read ran at an even (settled) epoch

    def test_serving_fns_correct_under_compaction_fire(self, spark, tmp_path):
        """store_serving_fns answers correctly while per-day compactions
        swap the very files being served, in a tight loop."""
        import threading

        from kenshin_spark.serving import store_serving_fns

        st = self._mk(spark, tmp_path)
        for b in range(2, 5):  # fragment the mor log → compaction has work
            st.upsert(
                0,
                spark.createDataFrame(
                    [("m.a", 60 * j, float(j)) for j in range(1, 9)],
                    ["metric", "ts", "value"],
                ),
            )
        lookup, fetch_fn = store_serving_fns(st)
        want = {60 * j: float(j) for j in range(1, 9)}
        stop = threading.Event()
        errors = []

        def hammer():
            while not stop.is_set():
                try:
                    got = dict(lookup("m.a"))
                    assert got == want, f"torn read: {got}"
                except Exception as exc:  # noqa: BLE001
                    errors.append(exc)
                    return

        threads = [threading.Thread(target=hammer) for _ in range(2)]
        for t in threads:
            t.start()
        try:
            for _ in range(4):
                st.compact(0, days=[0])
        finally:
            stop.set()
            for t in threads:
                t.join(timeout=120)
        assert not errors, errors
        rows = fetch_fn(["m.a"], 0, 60 * 9, 60 * 9)
        assert {ts: v for _, ts, v in rows if v is not None} == want


class TestServingPool:
    def test_lookup_tags_and_resets_scheduler_pool(self, spark, tmp_path):
        """store_serving_fns must tag its jobs with the serving pool for
        the duration of the lookup and reset the thread's local property
        after — leaking the tag would put unrelated jobs on this thread
        into the serving pool. (Pool WEIGHTING only applies under
        get_spark(fair_pools=True); the tag itself is scheduler-mode
        agnostic.)"""
        from kenshin_spark.serving import store_serving_fns
        from kenshin_spark.session import SERVING_POOL

        st = ParquetTieredStore(
            spark, SCHEMA, str(tmp_path / "pool"), mode="mor"
        )
        st.upsert(
            0,
            spark.createDataFrame(
                [("m.p", 60, 1.0), ("m.p", 120, 2.0)],
                ["metric", "ts", "value"],
            ),
        )
        seen = {}
        orig_read = st.read

        def spying_read(i):
            seen["pool"] = spark.sparkContext.getLocalProperty(
                "spark.scheduler.pool"
            )
            return orig_read(i)

        st.read = spying_read
        # reader=st: tag behavior is what's under test, not the clone
        lookup, fetch_fn = store_serving_fns(st, reader=st)
        assert dict(lookup("m.p")) == {60: 1.0, 120: 2.0}
        assert seen["pool"] == SERVING_POOL
        assert (
            spark.sparkContext.getLocalProperty("spark.scheduler.pool")
            is None
        )
        rows = fetch_fn(["m.p"], 0, 180, 180)
        assert {ts: v for _, ts, v in rows if v is not None} == {
            60: 1.0, 120: 2.0,
        }

    def test_default_reader_is_isolated_missing_file_tolerant(
        self, spark, tmp_path
    ):
        """The default serving reader is a clone on a CHILD SparkSession
        with ignoreMissingFiles=true — scoped there so the writer's own
        scans still fail loudly on vanished files."""
        from kenshin_spark.serving import store_serving_fns

        st = ParquetTieredStore(
            spark, SCHEMA, str(tmp_path / "iso"), mode="mor",
            commit_protocol="seqlock",  # the conf under test is seqlock-only
        )
        st.upsert(
            0,
            spark.createDataFrame(
                [("m.i", 60, 1.0)], ["metric", "ts", "value"]
            ),
        )
        lookup, fetch_fn = store_serving_fns(st)
        reader = lookup.reader_store
        assert reader is not st and reader.root == st.root
        assert reader.spark is not st.spark  # isolated SQL conf
        assert (
            reader.spark.conf.get("spark.sql.files.ignoreMissingFiles")
            == "true"
        )
        # the writer session keeps the default (loud) behavior
        assert (
            st.spark.conf.get("spark.sql.files.ignoreMissingFiles")
            == "false"
        )
        assert dict(lookup("m.i")) == {60: 1.0}


class TestRetrySelfMetrics:
    def test_retry_counters_roundtrip_through_ingest(self, spark, tmp_path):
        """store.retry_metrics emits the seqlock pressure counters in the
        S8 self-metrics shape, and they round-trip through the real
        ingest path like the reference's rurouni.* counters
        (rurouni/state/instrumentation.py:66-113)."""
        from kenshin_spark.config import SchemaSet
        from kenshin_spark.streaming import StreamingIngest

        st = ParquetTieredStore(
            spark, SCHEMA, str(tmp_path / "rm"), mode="mor",
            commit_protocol="seqlock",  # seqlock pressure counters under test
        )
        st.upsert(
            0,
            spark.createDataFrame(
                [("m.r", 60, 1.0)], ["metric", "ts", "value"]
            ),
        )

        def racy():
            if not st.read_retry_stats["epoch_races"]:
                with st._swap_guard():
                    pass
            return 1

        st.consistent_read(racy)
        now = 86_400 * 10
        pts = st.retry_metrics(now)
        names = {m for m, _, _ in pts}
        assert f"rurouni.store.{SCHEMA.name}.read.epoch_races" in names
        assert f"rurouni.store.{SCHEMA.name}.swap_epoch" in names
        got = {m: v for m, _, v in pts}
        assert got[f"rurouni.store.{SCHEMA.name}.read.epoch_races"] == 1.0
        assert got[f"rurouni.store.{SCHEMA.name}.swap_epoch"] % 2 == 0

        mon_schema = Schema.from_strings(
            "selfmon", "^rurouni\\.", "60s:1d", xff=1.0, agg_method="last"
        )
        ing = StreamingIngest(
            spark,
            SchemaSet((mon_schema,)),
            str(tmp_path / "mon"),
            clock=lambda: now,
            store_mode="mor",
        )
        ing.process_batch(
            spark.createDataFrame(pts, ["metric", "ts", "value"])
            .withColumn("arrival", F.lit(now)),
            0,
        )
        mon = ing.store_for(mon_schema)
        stored = {
            r["metric"]: r["value"] for r in mon.read(0).collect()
        }
        assert (
            stored[f"rurouni.store.{SCHEMA.name}.read.epoch_races"] == 1.0
        )
