"""Top-level fake page fetcher (importable on executors) for the
paged_rest data source tests."""

from __future__ import annotations

import json

PER_PAGE = 50
TOTAL = 230  # 5 pages: 50*4 + 30


# Upstream extent for the streaming source test. File-backed: the
# stream reader executes in a separate Python runner process, so
# module-level mutation would not reach it.
PAGES_FILE = "/tmp/spark_graft_rest_pages.txt"


def _atomic_write(path: str, value: int) -> None:
    # the stream reader polls these files continuously (default trigger);
    # a truncate-then-write would expose an empty file mid-write and
    # crash the poll with int('') — write-temp-then-rename is atomic
    import os

    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        f.write(str(value))
    os.replace(tmp, path)


def set_current_pages(n: int) -> None:
    _atomic_write(PAGES_FILE, n)


def latest_page(endpoint: str) -> int:
    try:
        with open(PAGES_FILE) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return 2


def fetch_fixed_page(endpoint: str, page: int) -> list[str]:
    """Exactly PER_PAGE rows per page (page count driven by latest_page)."""
    start = (page - 1) * PER_PAGE
    return [
        json.dumps(
            {
                "sha": f"{endpoint}-p{page}-sha{i}",
                "commit": {
                    "author": {"email": "a@x", "date": f"2024-01-01T00:{i % 60:02d}:00Z"},
                    "committer": None,
                    "message": f"msg {i}",
                },
            }
        )
        for i in range(start, start + PER_PAGE)
    ]


def fake_fetch_page(endpoint: str, page: int) -> list[str]:
    start, end = (page - 1) * PER_PAGE, min(page * PER_PAGE, TOTAL)
    return [
        json.dumps(
            {
                "sha": f"{endpoint}-sha{i}",
                "commit": {
                    "author": {"email": "a@x", "date": f"2024-01-01T00:{i % 60:02d}:00Z"},
                    "committer": None,
                    "message": f"msg {i}",
                },
            }
        )
        for i in range(start, end)
    ]


# Tail-page growth scenario: the newest page fills incrementally.
TAIL_FILE = "/tmp/spark_graft_rest_tail.txt"


def set_tail_rows(n: int) -> None:
    _atomic_write(TAIL_FILE, n)


def _tail_rows() -> int:
    try:
        with open(TAIL_FILE) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return PER_PAGE


def fetch_growing_page(endpoint: str, page: int) -> list[str]:
    """Full pages except the current latest, which has _tail_rows() rows."""
    n = _tail_rows() if page == latest_page(endpoint) else PER_PAGE
    start = (page - 1) * PER_PAGE
    return [
        json.dumps({"sha": f"{endpoint}-p{page}-sha{start + i}", "commit": None})
        for i in range(n)
    ]


def fetch_page_with_token(endpoint: str, page: int, token: str | None = None) -> list[str]:
    """R14 fixture: echoes the auth token into each row."""
    start = (page - 1) * PER_PAGE
    return [
        json.dumps({"sha": f"tok={token}-sha{i}", "commit": None})
        for i in range(start, start + PER_PAGE)
    ]


def spool_post_batch(endpoint: str, lines: list[str]) -> str:
    """Writer test double: 'POST' a bulk payload by spooling it to a
    uniquely-named file under the endpoint directory; the filename is
    the receipt."""
    import os
    import uuid

    os.makedirs(endpoint, exist_ok=True)
    name = f"batch-{uuid.uuid4().hex}.jsonl"
    with open(os.path.join(endpoint, name), "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    return name


def failing_post_batch(endpoint: str, lines: list[str]) -> str:
    """Writer test double that fails — drives the abort path."""
    raise RuntimeError("upstream rejected the batch")
