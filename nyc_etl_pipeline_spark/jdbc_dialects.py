"""JDBC dialect helpers for the engine's optional RDBMS connectors.

The reference talks to two dialect-quirky databases — MySQL for the
datamart (reference assets/gold.py:36-54) and SQL Server for the
report marts (assets/platinum.py:31-59) — via hard-coded URL/driver
strings. Spark's own JdbcDialect handles SQL generation once a
connection exists; what still trips users up is everything *around*
it: which driver class a URL needs, how identifiers must be quoted
when passing raw ``dbtable``/``query`` fragments, and which overwrite
strategy is safe (``truncate=true`` preserves indexes/grants but only
where the dialect supports TRUNCATE TABLE).

Pure functions over URL strings — unit-testable with no server; the
Derby integration test exercises quoting against a real connection.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Dialect:
    name: str
    url_prefix: str
    driver: str | None  # None = autoloaded / bundled
    quote_open: str
    quote_close: str
    supports_truncate: bool
    # dialect type for unbounded text, for createTableColumnTypes
    long_text_type: str


_DIALECTS = (
    Dialect("mysql", "jdbc:mysql:", "com.mysql.cj.jdbc.Driver", "`", "`", True, "TEXT"),
    Dialect(
        "sqlserver",
        "jdbc:sqlserver:",
        "com.microsoft.sqlserver.jdbc.SQLServerDriver",
        "[",
        "]",
        True,
        "VARCHAR(MAX)",
    ),
    Dialect("postgresql", "jdbc:postgresql:", "org.postgresql.Driver", '"', '"', True, "TEXT"),
    # Derby ships inside the Spark distribution (used by tests); it has
    # no TRUNCATE TABLE support through the JDBC sink path.
    Dialect("derby", "jdbc:derby:", None, '"', '"', False, "CLOB"),
)


def dialect_for(url: str) -> Dialect:
    for d in _DIALECTS:
        if url.startswith(d.url_prefix):
            return d
    raise ValueError(f"no known JDBC dialect for url {url!r}")


def quote_ident(url: str, identifier: str) -> str:
    """Quote one identifier (table/column) for the url's dialect.
    Embedded quote characters are doubled per each dialect's escape
    rule (``]`` -> ``]]`` on SQL Server, backtick doubling on MySQL,
    ANSI double-double-quote elsewhere)."""
    d = dialect_for(url)
    escaped = identifier.replace(d.quote_close, d.quote_close * 2)
    return f"{d.quote_open}{escaped}{d.quote_close}"


def connection_props(url: str, user: str | None = None, password: str | None = None, **extra: str) -> dict[str, str]:
    """Option dict for jdbc_read/jdbc_write with the driver class
    resolved from the URL (the reference hard-coded driver strings next
    to every call site — gold.py:40, platinum.py:38)."""
    d = dialect_for(url)
    props: dict[str, str] = {}
    if d.driver:
        props["driver"] = d.driver
    if user is not None:
        props["user"] = user
    if password is not None:
        props["password"] = password
    props.update(extra)
    return props


def overwrite_props(url: str) -> dict[str, str]:
    """Safe overwrite options per dialect: where TRUNCATE is supported,
    ``truncate=true`` makes overwrite empty-and-refill instead of
    drop-and-recreate — preserving indexes, grants, and the exact
    column types a DBA provisioned (the drop path recreates the table
    from Spark's type mapping, which is how a MySQL DECIMAL column
    silently becomes DOUBLE on re-run)."""
    d = dialect_for(url)
    return {"truncate": "true"} if d.supports_truncate else {}
