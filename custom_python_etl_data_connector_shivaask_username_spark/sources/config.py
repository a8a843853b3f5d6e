"""Connector configuration (SURVEY.md §2.1 S4).

The reference mandates per-connector secrets in a ``.env`` file, loaded at
startup and injected as auth headers/params, never committed
(``/root/reference/README.md:17-18,82,92-94``). ConnectorConfig is that
contract: environment-driven, explicit, serializable to executors (it is
captured by closure into data-source partitions — plain strings only, no
live clients).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def load_env(path: str = ".env", *, override: bool = False) -> dict[str, str]:
    """Minimal KEY=VALUE .env loader (comments + blank lines skipped,
    optional single/double quotes stripped). Merged into os.environ."""
    loaded: dict[str, str] = {}
    if os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                key, _, val = line.partition("=")
                key, val = key.strip(), val.strip()
                if len(val) >= 2 and val[0] == val[-1] and val[0] in "\"'":
                    val = val[1:-1]
                loaded[key] = val
                if override or key not in os.environ:
                    os.environ[key] = val
    return loaded


@dataclass
class ConnectorConfig:
    """Everything one REST connector needs (README.md:12-18).

    Pagination modes (S2):
      - ``page``: query param increments until an empty/short page
      - ``cursor``: response carries the next cursor under ``cursor_field``
      - ``next_url``: response carries a full next-page URL
    """

    name: str
    base_url: str
    endpoint: str = ""
    params: dict[str, str] = field(default_factory=dict)
    headers: dict[str, str] = field(default_factory=dict)
    auth_token: str | None = None
    auth_header: str = "Authorization"
    auth_scheme: str = "Bearer"
    pagination: str = "page"  # page | cursor | next_url | none
    page_param: str = "page"
    page_size_param: str = "limit"
    page_size: int = 100
    cursor_field: str = "next_cursor"
    cursor_param: str = "cursor"
    next_url_field: str = "next"
    data_field: str | None = "data"  # where records live in the payload
    max_pages: int = 10_000
    rate_limit_per_sec: float = 0.0  # 0 = unlimited
    max_retries: int = 4
    backoff_base_sec: float = 0.5
    timeout_sec: float = 30.0

    @property
    def url(self) -> str:
        return self.base_url.rstrip("/") + (
            "/" + self.endpoint.lstrip("/") if self.endpoint else ""
        )

    def request_headers(self) -> dict[str, str]:
        h = dict(self.headers)
        if self.auth_token:
            value = (
                f"{self.auth_scheme} {self.auth_token}"
                if self.auth_scheme
                else self.auth_token
            )
            h[self.auth_header] = value
        return h

    @classmethod
    def from_env(
        cls, name: str, env_path: str = ".env", **overrides
    ) -> "ConnectorConfig":
        """Build from ``{NAME}_*`` environment variables (.env merged
        first), e.g. ``MYAPI_BASE_URL``, ``MYAPI_AUTH_TOKEN``,
        ``MYAPI_RATE_LIMIT_PER_SEC``."""
        load_env(env_path)
        prefix = name.upper().replace("-", "_") + "_"

        def env(key: str, default=None):
            return os.environ.get(prefix + key.upper(), default)

        kwargs: dict = {"name": name, "base_url": env("BASE_URL", "")}
        for f, caster in (
            ("endpoint", str),
            ("auth_token", str),
            ("auth_header", str),
            ("auth_scheme", str),
            ("pagination", str),
            ("page_param", str),
            ("page_size_param", str),
            ("page_size", int),
            ("cursor_field", str),
            ("cursor_param", str),
            ("next_url_field", str),
            ("data_field", str),
            ("max_pages", int),
            ("rate_limit_per_sec", float),
            ("max_retries", int),
            ("backoff_base_sec", float),
            ("timeout_sec", float),
        ):
            raw = env(f)
            if raw is not None:
                kwargs[f] = caster(raw)
        kwargs.update(overrides)
        return cls(**kwargs)
