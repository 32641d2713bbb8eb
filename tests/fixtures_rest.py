"""Top-level fake page fetcher (importable on executors) for the
paged_rest data source tests."""

from __future__ import annotations

import json

PER_PAGE = 50
TOTAL = 230  # 5 pages: 50*4 + 30


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
