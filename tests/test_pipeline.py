"""Reference-parity pipeline tests (SURVEY.md §5.4): projection/fallback
semantics, idempotence across overlapping batches, watermark
monotonicity, repo namespacing. Fixture per FIXTURES.md table 11."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from hapiy_etl_spark.pipeline.ingest import (
    CommitsPipeline,
    JsonCommitsSource,
    PipelineConfig,
    RestCommitsSource,
    parse_commits,
)


def wire_row(sha, author_email, author_date, committer_email, committer_date, message="m"):
    return {
        "sha": sha,
        "commit": {
            "author": {"email": author_email, "date": author_date},
            "committer": {"email": committer_email, "date": committer_date},
            "message": message,
        },
    }


BATCH1 = [
    # normal row
    wire_row("aaa", "a@x.com", "2024-01-01T10:00:00Z", "c@x.com", "2024-01-01T10:00:05Z"),
    # author date null → BOTH ts and email fall back to committer
    # even though author email exists (git_etl.ts:100-105)
    wire_row("bbb", "author@x.com", None, "committer@x.com", "2024-01-02T11:00:00Z"),
    # both dates null → null commit_ts (watermark must skip it)
    wire_row("ccc", "c3@x.com", None, "c3c@x.com", None),
    # same-second siblings (watermark edge, git_etl.ts:321-324)
    wire_row("dd1", "d@x.com", "2024-01-03T12:00:00Z", None, None),
    wire_row("dd2", "d@x.com", "2024-01-03T12:00:00Z", None, None),
]

BATCH2 = [
    # duplicate sha re-delivered (idempotent upsert, git_etl.ts:127-132)
    wire_row("dd2", "d@x.com", "2024-01-03T12:00:00Z", None, None),
    # genuinely new commit
    wire_row("eee", "e@x.com", "2024-01-04T09:00:00Z", None, None),
]


def write_fixture(tmp_path, rows, name):
    p = tmp_path / name
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


def test_parse_commits_fallback_semantics(spark, tmp_path):
    src = JsonCommitsSource(write_fixture(tmp_path, BATCH1, "b1.jsonl"))
    out = {r.commit_hash: r for r in parse_commits(src.fetch(spark, None), "repo1").collect()}
    assert len(out) == 5
    # normal: author wins for both fields
    assert out["aaa"].commit_email == "a@x.com"
    assert out["aaa"].commit_ts.isoformat() == "2024-01-01T10:00:00"
    # author date null: BOTH swap to committer — author email discarded
    assert out["bbb"].commit_email == "committer@x.com"
    assert out["bbb"].commit_ts.isoformat() == "2024-01-02T11:00:00"
    # both dates null → null ts, committer email (possibly null)
    assert out["ccc"].commit_ts is None
    assert out["ccc"].commit_email == "c3c@x.com"
    assert out["dd1"].repo == "repo1"


def test_pipeline_idempotent_and_watermarked(spark, tmp_path):
    cfg = PipelineConfig(repo="repo1", owner="o", state_dir=str(tmp_path / "state"))
    b1 = write_fixture(tmp_path, BATCH1, "b1.jsonl")
    b2 = write_fixture(tmp_path, BATCH1 + BATCH2, "b12.jsonl")

    pipe = CommitsPipeline(cfg, JsonCommitsSource(b1))
    assert pipe.run_once(spark) == 5
    assert pipe.state(spark).count() == 5
    wm1 = pipe._wm.get("repo1")
    assert wm1.isoformat() == "2024-01-03T12:00:00"  # null ts skipped (R8)

    # tick 2 over overlapping data: only rows strictly after the
    # watermark are fetched (strict > ≡ reference's +1s intent, R9) and
    # re-delivered keys upsert idempotently (R6)
    pipe.source = JsonCommitsSource(b2)
    n = pipe.run_once(spark)
    assert n == 1  # only 'eee' — dd2 is at, not after, the watermark
    state = pipe.state(spark)
    assert state.count() == 6
    assert state.where(F.col("commit_hash") == "dd2").count() == 1
    wm2 = pipe._wm.get("repo1")
    assert wm2 > wm1 and wm2.isoformat() == "2024-01-04T09:00:00"

    # tick 3, no new data → no-op, watermark unchanged
    assert pipe.run_once(spark) == 0
    assert pipe._wm.get("repo1") == wm2


def test_pipeline_repo_namespacing(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    b1 = write_fixture(tmp_path, BATCH1, "b1.jsonl")
    p1 = CommitsPipeline(PipelineConfig(repo="repo1", owner="o", state_dir=state_dir), JsonCommitsSource(b1))
    p1.run_once(spark)
    # second repo shares the state table; clear_on_startup=False to keep it
    p2 = CommitsPipeline(
        PipelineConfig(repo="repo2", owner="o", state_dir=state_dir, clear_on_startup=False),
        JsonCommitsSource(write_fixture(tmp_path, BATCH2, "b2.jsonl")),
    )
    p2.run_once(spark)
    # prefix scan ≡ partition pruning: each pipeline sees only its repo (R7)
    assert p1.state(spark).count() == 5
    assert p2.state(spark).count() == 2
    assert set(r.repo for r in p2.state(spark).collect()) == {"repo2"}


def test_pipeline_clear_on_startup(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    b1 = write_fixture(tmp_path, BATCH1, "b1.jsonl")
    p1 = CommitsPipeline(PipelineConfig(repo="repo1", owner="o", state_dir=state_dir), JsonCommitsSource(b1))
    p1.run_once(spark)
    # clear_on_startup=True truncates prior state (R10)
    p2 = CommitsPipeline(PipelineConfig(repo="repo1", owner="o", state_dir=state_dir), JsonCommitsSource(b1))
    assert p2.state(spark).count() == 0
    assert p2.run_once(spark) == 5


def test_config_validation():
    with pytest.raises(ValueError, match="repo"):
        PipelineConfig(repo="")
    with pytest.raises(ValueError, match="boolean"):
        PipelineConfig(clear_on_startup="yes")  # type: ignore[arg-type]


def test_rest_source_paginates(spark):
    # 250 commits → 3 pages at per_page=100; injectable fetch, no network
    def fake_fetch(owner, repo, page, since):
        start, end = (page - 1) * 100, min(page * 100, 250)
        return [
            json.dumps(wire_row(f"sha{i}", "a@x", f"2024-01-01T00:{i % 60:02d}:00Z", None, None))
            for i in range(start, end)
        ]

    src = RestCommitsSource("o", "r", fake_fetch)
    df = src.fetch(spark, None)
    assert df.count() == 250
    parsed = parse_commits(df, "r")
    assert parsed.where(F.col("commit_ts").isNull()).count() == 0


def test_config_cron_and_token_validation():
    """R13 cron parseability + R14 flag-gated env credential."""
    import os

    import pytest as _pytest

    from hapiy_etl_spark.pipeline.ingest import PipelineConfig, cron_interval_seconds

    with _pytest.raises(ValueError, match="cron_schedule"):
        PipelineConfig(cron_schedule="every five minutes")
    with _pytest.raises(ValueError, match="cron_schedule"):
        PipelineConfig(cron_schedule="*/5 * * *")  # 4 fields
    with _pytest.raises(ValueError, match="use_github_token"):
        PipelineConfig(use_github_token="yes")  # type: ignore[arg-type]

    assert cron_interval_seconds("*/5 * * * *") == 300
    assert cron_interval_seconds("*/1 * * * *") == 60
    assert cron_interval_seconds("0 3 * * *") is None  # not an every-N form

    cfg = PipelineConfig(use_github_token=True, token_env="FAKE_REST_PAT")
    assert cfg.resolve_token() == os.environ["FAKE_REST_PAT"]  # set in conftest
    assert PipelineConfig(use_github_token=False).resolve_token() is None


def test_rest_source_token_passthrough(spark):
    """R14 end-to-end: config flag -> env token -> fetcher kwarg."""
    from hapiy_etl_spark.pipeline.ingest import PipelineConfig, RestCommitsSource

    seen_tokens = []

    def fetch_page(owner, repo, page, since, token=None):
        seen_tokens.append(token)
        return []  # one empty page ends the loop

    cfg = PipelineConfig(use_github_token=True, token_env="FAKE_REST_PAT")
    src = RestCommitsSource("o", "r", fetch_page, token=cfg.resolve_token())
    src.fetch(spark, None)
    assert seen_tokens == ["s3cret"]

    # flag off -> plain 4-arg call, no token kwarg
    calls = []

    def fetch_plain(owner, repo, page, since):
        calls.append(page)
        return []

    RestCommitsSource("o", "r", fetch_plain, token=PipelineConfig().resolve_token()).fetch(
        spark, None
    )
    assert calls == [1]
