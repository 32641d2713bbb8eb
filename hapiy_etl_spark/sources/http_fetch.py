"""Production HTTP page fetchers for the REST sources (stdlib urllib).

Reference parity: git_etl.ts:53-74 — ``octokit.paginate`` over
``GET /repos/{owner}/{repo}/commits`` with ``per_page``/``since`` — and
git_etl.ts:340-346 — the auth token injected as a header only when
configured. This module is the "real client" both injectable seams
point at:

- ``github_fetch_page`` matches ``RestCommitsSource``'s driver-side
  seam ``(owner, repo, page, since, token=...) -> list[json str]``
  (pipeline/ingest.py).
- ``rest_fetch_page`` matches ``PagedRestDataSource``'s executor-side
  seam ``(endpoint, page, token=...) -> list[json str]``
  (sources/rest_source.py); it is a top-level importable so it pickles
  to executors by dotted name. ``endpoint`` is either ``owner/repo``
  (GitHub commits) or a full ``http(s)://`` listing URL (GitHub
  Enterprise roots, or a local test server).

Transient failures (429/403 rate-limit, 5xx) retry with bounded backoff
honoring ``Retry-After`` — the one production behavior a paginating
client cannot skip. Anything else raises: a half-fetched page must fail
the task (Spark retries it) rather than silently truncate the batch.

The ``opener`` argument is itself injectable (tests use a fake opener
or a 127.0.0.1 server; this container has no outbound network).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from datetime import datetime, timezone

GITHUB_API_ROOT = "https://api.github.com"
PER_PAGE = 100
_RETRY_STATUS = {403, 429, 500, 502, 503, 504}


def _iso_utc(ts: datetime) -> str:
    """GitHub's ``since`` wants ISO-8601 UTC (YYYY-MM-DDTHH:MM:SSZ)."""
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    return ts.isoformat(timespec="seconds") + "Z"


def build_commits_request(
    owner: str,
    repo: str,
    page: int,
    since: datetime | None = None,
    token: str | None = None,
    per_page: int = PER_PAGE,
    api_root: str = GITHUB_API_ROOT,
) -> urllib.request.Request:
    """The exact wire request the reference issues (git_etl.ts:53-74):
    commits listing with per_page/page/since, JSON accept header, and
    the bearer token present IFF configured (git_etl.ts:340-346)."""
    qs: dict[str, str] = {"per_page": str(per_page), "page": str(page)}
    if since is not None:
        qs["since"] = _iso_utc(since)
    url = (
        f"{api_root}/repos/{urllib.parse.quote(owner)}/"
        f"{urllib.parse.quote(repo)}/commits?{urllib.parse.urlencode(qs)}"
    )
    return _request(url, token)


def _request(url: str, token: str | None) -> urllib.request.Request:
    headers = {
        "Accept": "application/vnd.github+json",
        "User-Agent": "hapiy-etl-spark",
        "X-GitHub-Api-Version": "2022-11-28",
    }
    if token:
        headers["Authorization"] = f"Bearer {token}"
    return urllib.request.Request(url, headers=headers)


def _fetch_json_list(
    req: urllib.request.Request,
    opener=None,
    timeout: float = 30.0,
    max_retries: int = 2,
    backoff: float = 1.0,
) -> list[str]:
    """GET → parse JSON array → one compact JSON string per item (the
    row format both REST sources consume). Retries transient statuses
    with Retry-After-aware backoff; re-raises everything else."""
    op = opener or urllib.request.build_opener()
    attempt = 0
    while True:
        try:
            with op.open(req, timeout=timeout) as resp:
                body = resp.read()
            break
        except urllib.error.HTTPError as ex:
            if ex.code not in _RETRY_STATUS or attempt >= max_retries:
                raise
            retry_after = ex.headers.get("Retry-After") if ex.headers else None
            # a malformed header (e.g. "1.2.3", or an HTTP-date) must
            # fall back to exponential backoff, not crash the retry path
            try:
                delay = float(retry_after) if retry_after else None
            except ValueError:
                delay = None
            if delay is None or delay < 0:
                delay = backoff * (2**attempt)
            time.sleep(delay)
            attempt += 1
    items = json.loads(body)
    if not isinstance(items, list):
        raise ValueError(
            f"expected a JSON array of items from {req.full_url}, "
            f"got {type(items).__name__}"
        )
    return [json.dumps(item, sort_keys=True) for item in items]


def github_fetch_page(
    owner: str,
    repo: str,
    page: int,
    since: datetime | None = None,
    *,
    token: str | None = None,
    opener=None,
    per_page: int = PER_PAGE,
    api_root: str = GITHUB_API_ROOT,
    timeout: float = 30.0,
) -> list[str]:
    """Driver-side seam for ``RestCommitsSource``: production swap-in is

        RestCommitsSource(owner, repo,
                          fetch_page=github_fetch_page,
                          token=cfg.resolve_token())
    """
    req = build_commits_request(
        owner, repo, page, since, token, per_page=per_page, api_root=api_root
    )
    return _fetch_json_list(req, opener=opener, timeout=timeout)


def rest_fetch_page(
    endpoint: str,
    page: int,
    *,
    token: str | None = None,
    opener=None,
    per_page: int = PER_PAGE,
    timeout: float = 30.0,
) -> list[str]:
    """Executor-side seam for ``PagedRestDataSource``:

        .option("fetcher", "hapiy_etl_spark.sources.http_fetch.rest_fetch_page")

    ``endpoint`` forms: ``owner/repo`` hits the GitHub commits listing;
    a full ``http(s)://`` URL is paginated as ``?page=N&per_page=M``
    (enterprise roots / test servers)."""
    if endpoint.startswith(("http://", "https://")):
        sep = "&" if "?" in endpoint else "?"
        url = f"{endpoint}{sep}{urllib.parse.urlencode({'page': str(page), 'per_page': str(per_page)})}"
        req = _request(url, token)
    else:
        owner, _, repo = endpoint.partition("/")
        if not owner or not repo:
            raise ValueError(
                f"endpoint must be 'owner/repo' or a full URL, got {endpoint!r}"
            )
        req = build_commits_request(owner, repo, page, token=token, per_page=per_page)
    return _fetch_json_list(req, opener=opener, timeout=timeout)
