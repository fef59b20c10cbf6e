"""Provision a throwaway local PostgreSQL for the live wire tests.

The container ships a real PostgreSQL 15 server (/usr/local/bin) but no
Python driver — the engine's own ``pgwire`` module (pure-stdlib wire
protocol v3) covers the client side, and THIS helper covers the server
side: initdb into a temp dir, trust auth on 127.0.0.1, a free port,
teardown at session end.  Root-safe: postgres refuses to run as uid 0,
so under root the server runs as the ``postgres`` user via ``runuser``
(the temp dir is chown'd over).  Returns None (with a reason) when the
environment genuinely can't host one, so callers skip visibly instead
of erroring.
"""

from __future__ import annotations

import os
import shutil
import socket
import subprocess
import tempfile
import time


def _find(binary: str) -> str | None:
    return shutil.which(binary) or (
        p if os.path.exists(p := f"/usr/local/bin/{binary}") else None
    )


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(cmd: list[str], as_postgres: bool) -> subprocess.CompletedProcess:
    if as_postgres:
        cmd = ["runuser", "-u", "postgres", "--", *cmd]
    return subprocess.run(
        cmd, capture_output=True, text=True, timeout=120, cwd="/tmp"
    )


def provision() -> tuple[str, "callable"] | tuple[None, str]:
    """``(url, stop)`` on success, ``(None, reason)`` when this host
    can't run a server."""
    initdb, pg_ctl = _find("initdb"), _find("pg_ctl")
    if not (initdb and pg_ctl):
        return None, "no PostgreSQL server binaries (initdb/pg_ctl) on PATH"
    as_pg = os.geteuid() == 0
    if as_pg:
        probe = subprocess.run(
            ["runuser", "-u", "postgres", "--", "true"], capture_output=True
        )
        if probe.returncode != 0:
            return None, (
                "running as root and no 'postgres' user to drop to "
                "(postgres refuses uid 0)"
            )
    tmp = tempfile.mkdtemp(prefix="spark_graft_pg_")
    if as_pg:
        shutil.chown(tmp, "postgres", "postgres")
    data = f"{tmp}/data"
    r = _run([initdb, "-D", data, "--auth=trust", "-U", "postgres"], as_pg)
    if r.returncode != 0:
        shutil.rmtree(tmp, ignore_errors=True)
        return None, f"initdb failed: {r.stderr.strip()[-300:]}"
    port = _free_port()
    r = _run(
        [
            pg_ctl, "-D", data, "-l", f"{tmp}/pg.log",
            "-o",
            f"-p {port} -c listen_addresses=127.0.0.1 "
            f"-c unix_socket_directories={tmp}",
            "start",
        ],
        as_pg,
    )
    if r.returncode != 0:
        shutil.rmtree(tmp, ignore_errors=True)
        return None, f"pg_ctl start failed: {r.stderr.strip()[-300:]}"

    url = f"postgresql://postgres@127.0.0.1:{port}/postgres"

    def stop() -> None:
        _run([pg_ctl, "-D", data, "-m", "immediate", "stop"], as_pg)
        shutil.rmtree(tmp, ignore_errors=True)

    from airflow_postgres_etl_spark import pgwire

    deadline = time.monotonic() + 15
    while True:
        try:
            pgwire.connect(url, timeout=3).close()
            return url, stop
        except Exception as exc:
            if time.monotonic() > deadline:
                stop()
                return None, f"server never became ready: {exc}"
            time.sleep(0.25)
