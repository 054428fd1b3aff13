"""Serving DURING a live append: the daemon's point-in-time engine plus
the snapshot gate must make every response identical to the pre-append
response for the whole duration of the append — no partial generations,
no stats/postings mixing, no errors — and a fresh engine afterwards sees
the published union."""

import json
import threading
import urllib.request

from polaris_spark.index.build import IndexConfig, build_index
from polaris_spark.index.maintenance import append_index
from polaris_spark.query.engine import SearchEngine
from polaris_spark.server import serve

BASE = [(i, f"alpha beta doc{i}") for i in range(1, 31)]
BATCH = [(i, f"alpha beta extra doc{i}") for i in range(31, 61)]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _post(base, method, body):
    req = urllib.request.Request(
        f"{base}/api/{method}", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_responses_stable_through_live_append(spark, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, _mk(spark, BASE), d, doc_id_col="doc_id",
                cfg=IndexConfig(n_buckets=8, n_shards=2, n_chunks=2))
    srv, _t = serve(spark, d, port=0, cache_terms=256)
    base_url = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    try:
        want = _post(base_url, "search",
                     {"query": "alpha beta", "rankTo": 50, "payload": False})
        assert want["count"] == len(BASE)

        err: list = []

        def _append():
            try:
                append_index(spark, _mk(spark, BATCH), d, doc_id_col="doc_id")
            except Exception as e:  # surfaced below
                err.append(e)

        th = threading.Thread(target=_append)
        th.start()
        # hammer the daemon for the whole append; every response must be
        # bit-identical to the pre-append snapshot
        polls = 0
        while th.is_alive():
            got = _post(base_url, "search",
                        {"query": "alpha beta", "rankTo": 50,
                         "payload": False})
            assert got["hits"] == want["hits"] and got["count"] == want["count"]
            polls += 1
        th.join()
        assert not err, err
        assert polls > 0  # the append took long enough to observe

        # the daemon's engine stays point-in-time even after publish
        got = _post(base_url, "search",
                    {"query": "alpha beta", "rankTo": 50, "payload": False})
        assert got["count"] == len(BASE)
    finally:
        srv.shutdown()

    # a FRESH engine sees the published union, scored with the new stats
    eng = SearchEngine(spark, d)
    ids = {h["doc_id"] for h in eng.search("alpha beta", k=None)}
    assert ids == {i for i, _t2 in BASE} | {i for i, _t2 in BATCH}
