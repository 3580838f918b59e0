"""SFTP location: the REAL OpenSSH sftp client driven against a local
Python SFTP v3 stub server (``sftp -D`` — raw protocol over stdio, no
sshd needed). This is an end-to-end protocol test, not a mock: version
negotiation, stat, open/read pipelining, and close all run through
OpenSSH's actual implementation."""

from __future__ import annotations

import os
import shutil
import sys

import pytest

from astro_sdk_spark.files import File

pytestmark = pytest.mark.skipif(
    shutil.which("sftp") is None, reason="openssh-client not installed"
)

STUB = os.path.join(os.path.dirname(__file__), "sftp_stub_server.py")


def _sftp_file(path: str) -> File:
    return File(
        f"sftp://testhost{path}",
        load_options={"sftp_server_command": f"{sys.executable} {STUB}"},
    )


def test_sftp_staging_fetches_and_caches(tmp_path):
    src = tmp_path / "data.csv"
    src.write_text("a,b\n1,2\n3,4\n")
    f = _sftp_file(str(src))
    staged = f.staged_path()
    assert staged != str(src)
    assert open(staged).read() == "a,b\n1,2\n3,4\n"
    assert f.staged_path() == staged  # second call hits the cache


def test_sftp_large_binary_round_trip(tmp_path):
    """Multi-megabyte file: exercises OpenSSH's pipelined 32 KB READs
    against the stub; bytes must survive exactly."""
    src = tmp_path / "blob.parquet"
    payload = bytes(range(256)) * 16384  # 4 MiB
    src.write_bytes(payload)
    staged = _sftp_file(str(src)).staged_path()
    assert open(staged, "rb").read() == payload


def test_sftp_missing_file_raises(tmp_path):
    f = _sftp_file(str(tmp_path / "nope.csv"))
    with pytest.raises(RuntimeError, match="sftp fetch"):
        f.staged_path()


def test_sftp_load_file_end_to_end(spark, tmp_path):
    """load_file over sftp:// — the full operator path: OpenSSH fetch →
    schema autodetect → managed table."""
    from astro_sdk_spark.engine import SparkEngine
    from astro_sdk_spark.operators.load_file import load_file
    from astro_sdk_spark.table import Table

    src = tmp_path / "rows.csv"
    src.write_text("id,name\n1,alpha\n2,beta\n")
    eng = SparkEngine(spark)
    tbl = Table(name="sftp_loaded")
    eng.drop_table(tbl)
    load_file(_sftp_file(str(src)), tbl, engine=eng)
    got = sorted(
        (r.id, r.name) for r in spark.table("sftp_loaded").collect()
    )
    assert got == [(1, "alpha"), (2, "beta")]
    eng.drop_table(tbl)


def test_sftp_url_parsing_port_and_user(tmp_path, monkeypatch):
    """user@host:port destinations are split correctly (observed via the
    constructed argv — the stub ignores the destination)."""
    import subprocess

    seen: dict = {}
    real_run = subprocess.run

    def spy(cmd, **kw):
        seen["cmd"] = cmd
        return real_run(cmd, **kw)

    monkeypatch.setattr(subprocess, "run", spy)
    src = tmp_path / "p.csv"
    src.write_text("x\n1\n")
    f = File(
        f"sftp://alice@testhost:2222{src}",
        load_options={"sftp_server_command": f"{sys.executable} {STUB}"},
    )
    f.staged_path()
    cmd = seen["cmd"]
    assert "alice@testhost" in cmd
    assert cmd[cmd.index("-P") + 1] == "2222"
