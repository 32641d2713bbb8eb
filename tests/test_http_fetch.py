"""Production urllib fetcher (sources/http_fetch.py) against a real
local HTTP server — the closest the sandbox gets to the reference's
network op (git_etl.ts:53-74 pagination, 340-346 token header)."""

from __future__ import annotations

import json
import threading
import urllib.error
from datetime import datetime
from functools import partial
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from hapiy_etl_spark.sources.http_fetch import (
    build_commits_request,
    github_fetch_page,
    rest_fetch_page,
)

N_ROWS = 25  # total fake commits; per_page=10 → pages of 10/10/5


def _commit(i: int) -> dict:
    return {
        "sha": f"c{i:04d}",
        "commit": {
            "author": {
                "email": f"dev{i}@example.com",
                "date": f"2026-01-{(i % 27) + 1:02d}T00:00:00Z",
            },
            "committer": {"email": f"committer{i}@example.com", "date": None},
            "message": f"msg {i}",
        },
    }


class _Handler(BaseHTTPRequestHandler):
    server_version = "FakeHub/1.0"

    def do_GET(self):  # noqa: N802 (BaseHTTPRequestHandler API)
        url = urlparse(self.path)
        qs = parse_qs(url.query)
        self.server.seen.append(
            {"path": url.path, "qs": qs, "auth": self.headers.get("Authorization")}
        )
        if self.server.fail_next > 0:
            self.server.fail_next -= 1
            self.send_response(429)
            self.send_header("Retry-After", getattr(self.server, "retry_after", "0"))
            self.end_headers()
            return
        page = int(qs.get("page", ["1"])[0])
        per_page = int(qs.get("per_page", ["100"])[0])
        lo = (page - 1) * per_page
        items = [_commit(i) for i in range(lo, min(lo + per_page, N_ROWS))]
        body = json.dumps(items).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # keep pytest output clean
        pass


@pytest.fixture()
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.seen = []
    srv.fail_next = 0
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _root(srv) -> str:
    return f"http://127.0.0.1:{srv.server_address[1]}"


def test_build_request_wire_format():
    req = build_commits_request(
        "nakennedy11", "fx_firecast", 3, datetime(2026, 1, 2, 3, 4, 5), "tok123"
    )
    assert req.full_url == (
        "https://api.github.com/repos/nakennedy11/fx_firecast/commits"
        "?per_page=100&page=3&since=2026-01-02T03%3A04%3A05Z"
    )
    assert req.get_header("Authorization") == "Bearer tok123"
    assert req.get_header("Accept") == "application/vnd.github+json"


def test_build_request_no_token_no_auth_header():
    req = build_commits_request("o", "r", 1)
    assert req.get_header("Authorization") is None


def test_github_fetch_page_paginates_and_sends_token(server):
    rows = github_fetch_page(
        "o", "r", 1, token="tok", per_page=10, api_root=_root(server)
    )
    assert len(rows) == 10
    assert json.loads(rows[0])["sha"] == "c0000"
    assert server.seen[0]["path"] == "/repos/o/r/commits"
    assert server.seen[0]["auth"] == "Bearer tok"
    # tail page is short — the driver loop's stop condition
    tail = github_fetch_page("o", "r", 3, per_page=10, api_root=_root(server))
    assert len(tail) == 5
    assert server.seen[-1]["auth"] is None  # token only when configured


def test_github_fetch_page_since_param(server):
    github_fetch_page(
        "o", "r", 1, datetime(2026, 2, 3), per_page=10, api_root=_root(server)
    )
    assert server.seen[-1]["qs"]["since"] == ["2026-02-03T00:00:00Z"]


def test_retry_on_429_then_success(server):
    server.fail_next = 2
    rows = github_fetch_page("o", "r", 1, per_page=10, api_root=_root(server))
    assert len(rows) == 10
    assert len(server.seen) == 3  # two 429s + success


def test_retry_malformed_retry_after_falls_back_to_backoff(server):
    """'Retry-After: 1.2.3' (or an HTTP-date) must not crash the retry
    path with ValueError — it falls back to exponential backoff."""
    from hapiy_etl_spark.sources.http_fetch import build_commits_request, _fetch_json_list

    server.fail_next = 1
    server.retry_after = "1.2.3"
    req = build_commits_request("o", "r", 1, None, None, per_page=10, api_root=_root(server))
    rows = _fetch_json_list(req, backoff=0.01)
    assert len(rows) == 10
    assert len(server.seen) == 2  # one 429 + success


def test_retry_exhaustion_raises(server):
    server.fail_next = 10
    with pytest.raises(urllib.error.HTTPError):
        github_fetch_page("o", "r", 1, per_page=10, api_root=_root(server))


def test_rest_commits_source_end_to_end(spark, server):
    """R1 production-real: the pipeline's driver-side source paginating
    over actual HTTP, through the same seam tests inject fakes into."""
    from hapiy_etl_spark.pipeline.ingest import RestCommitsSource, parse_commits

    src = RestCommitsSource(
        "o",
        "r",
        fetch_page=partial(github_fetch_page, per_page=10, api_root=_root(server)),
        per_page=10,
    )
    out = parse_commits(src.fetch(spark, None), "r")
    rows = out.orderBy("commit_hash").collect()
    assert len(rows) == N_ROWS
    assert rows[0].commit_hash == "c0000"
    assert rows[0].commit_email == "dev0@example.com"
    # pages 1..3 were requested in order
    pages = [s["qs"]["page"][0] for s in server.seen]
    assert pages == ["1", "2", "3"]


def test_paged_rest_datasource_over_http(spark, server):
    """Executor-side fetch: partitions hit the local server from Spark
    python workers via the dotted-name production fetcher (full-URL
    endpoint form). Default per_page=100 ≥ N_ROWS, so page 1 carries all
    25 commits and pages 2-3 are empty — the count proves every
    partition's fetch ran over real HTTP without duplicating rows."""
    from hapiy_etl_spark.sources.rest_source import PagedRestDataSource

    spark.dataSource.register(PagedRestDataSource)
    df = (
        spark.read.format("paged_rest")
        .schema(
            "sha string, commit struct<author: struct<email: string, "
            "date: string>, committer: struct<email: string, date: string>, "
            "message: string>"
        )
        .option("endpoint", f"{_root(server)}/repos/o/r/commits")
        .option("n_pages", 3)
        .option("pages_per_partition", 2)
        .option("fetcher", "hapiy_etl_spark.sources.http_fetch.rest_fetch_page")
        .load()
    )
    assert df.count() == N_ROWS
    assert df.select("sha").distinct().count() == N_ROWS
    # each action re-scans the source, so pages repeat; the SET of
    # pages proves all three partition ranges fetched
    pages_hit = sorted({int(s["qs"]["page"][0]) for s in server.seen})
    assert pages_hit == [1, 2, 3]


def test_full_reference_flow_onto_tx_store(spark, server, tmp_path):
    """The reference's whole loop (R1 paginated fetch → R3/R4/R5
    projection → R6 transactional keyed upsert) on the snapshot-
    versioned store: two ingestion ticks MERGE into a TxTable, the
    second tick's re-fetched rows overwrite-by-key instead of
    duplicating (idempotent, exactly the KV set semantics), and the
    first tick's snapshot stays readable (time travel the KV never
    had)."""
    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.pipeline.ingest import RestCommitsSource, parse_commits

    src = RestCommitsSource(
        "o",
        "r",
        fetch_page=partial(github_fetch_page, per_page=10, api_root=_root(server)),
        per_page=10,
    )
    store = TxTable(spark, str(tmp_path / "commits"))

    # tick 1
    store.merge(parse_commits(src.fetch(spark, None), "r"), keys=["repo", "commit_hash"])
    n1 = store.read().count()
    assert n1 == N_ROWS
    # tick 2: same upstream rows re-fetched (the at-least-once overlap
    # every incremental poll has) — MERGE keeps the table keyed-unique
    store.merge(parse_commits(src.fetch(spark, None), "r"), keys=["repo", "commit_hash"])
    assert store.read().count() == N_ROWS
    assert store.read().select("commit_hash").distinct().count() == N_ROWS
    assert store.read(version=1).count() == N_ROWS  # tick-1 snapshot intact
    assert [m["op"] for m in store.history()] == ["merge", "merge"]
