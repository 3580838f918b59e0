"""File references and format dispatch — SURVEY §2.4.

Mirrors the reference's ``File`` (``python-sdk/src/astro/files/base.py:19-250``)
and its type-by-extension factory (``files/types/__init__.py:17-60``).
Spark natively reads globs and directories, so the reference's
pattern-resolution machinery (``files/base.py:253-286``) collapses to
"pass the glob to spark.read".

Supported formats: csv, json (array-of-records), ndjson (line-delimited),
parquet, xlsx/xls (driver-side — documented small-file path).
Locations: local paths plus any scheme Spark's Hadoop FS understands
(s3a://, gs://, wasbs://, abfss://). HTTP(S)/FTP/SFTP are fetched on the
driver to a staging dir (Spark cannot split or glob these streams),
matching the reference's smart_open behavior (``files/locations/http.py``,
``ftp.py``, ``sftp.py`` — SFTP rides the system OpenSSH client in batch
mode instead of paramiko).
"""

from __future__ import annotations

import atexit
import os
import pathlib
import tempfile
import urllib.request
from dataclasses import dataclass, field
from enum import Enum


def _unlink_quiet(path: str) -> None:
    try:
        os.unlink(path)
    except OSError:
        pass


def gdrive_to_url(path: str) -> str:
    """``gdrive://<file_id>[/<display_name.ext>]`` → Drive's public
    download URL. The optional trailing name only supplies the extension
    for filetype detection; the id is what Drive resolves.

    Reference ``files/locations/google/gdrive.py`` uses the authenticated
    Drive API; public anyone-with-the-link files are the subset reachable
    without it.
    """
    rest = path.removeprefix("gdrive://")
    file_id = rest.split("/", 1)[0].split("?")[0]
    if not file_id:
        raise ValueError(f"gdrive path {path!r} has no file id")
    return f"https://drive.google.com/uc?export=download&id={file_id}"


def _looks_like_html(local: str) -> bool:
    with open(local, "rb") as f:
        head = f.read(512).lstrip().lower()
    return head.startswith((b"<!doctype html", b"<html"))


class FileType(str, Enum):
    CSV = "csv"
    JSON = "json"
    NDJSON = "ndjson"
    PARQUET = "parquet"
    ORC = "orc"
    AVRO = "avro"
    XLSX = "xlsx"
    XLS = "xls"


_EXTENSION_TO_TYPE = {
    ".csv": FileType.CSV,
    ".json": FileType.JSON,
    ".ndjson": FileType.NDJSON,
    ".jsonl": FileType.NDJSON,
    ".parquet": FileType.PARQUET,
    ".pq": FileType.PARQUET,
    ".orc": FileType.ORC,
    ".avro": FileType.AVRO,
    ".xlsx": FileType.XLSX,
    ".xls": FileType.XLS,
}


#: transparent-compression suffixes: Spark/Hadoop decompress these inline
#: for the text formats (csv/json/ndjson), so `x.ndjson.gz` is just an
#: ndjson file — detection looks through the compression extension.
_COMPRESSION_SUFFIXES = {".gz", ".bz2", ".zst", ".lz4", ".snappy", ".deflate"}


def filetype_from_path(path: str) -> FileType:
    """Extension → FileType — reference ``files/types/__init__.py:17-60``.
    Compression suffixes (``.gz``/``.bz2``/…) are transparent: the type
    is taken from the extension underneath."""
    clean = pathlib.PurePosixPath(path.split("?")[0])
    suffix = clean.suffix.lower()
    if suffix in _COMPRESSION_SUFFIXES:
        inner = pathlib.PurePosixPath(clean.stem).suffix.lower()
        if inner in _EXTENSION_TO_TYPE:
            ftype = _EXTENSION_TO_TYPE[inner]
            if ftype in (FileType.CSV, FileType.JSON, FileType.NDJSON):
                return ftype
            raise ValueError(
                f"Compressed {inner} is not splittable-readable: '{path}'. "
                "Columnar formats carry their own compression — store "
                f"plain {inner} instead."
            )
    if suffix in _EXTENSION_TO_TYPE:
        return _EXTENSION_TO_TYPE[suffix]
    raise ValueError(
        f"Unsupported filetype '{suffix}' from file '{path}'. "
        f"Supported: {sorted(s for s in _EXTENSION_TO_TYPE)} "
        f"(+ {sorted(_COMPRESSION_SUFFIXES)} over csv/json/ndjson)"
    )


@dataclass
class File:
    """Path + optional explicit filetype + ndjson normalize config —
    reference ``files/base.py:19-110``."""

    path: str
    conn_id: str = ""  # parity; unused
    filetype: FileType | None = None
    normalize_config: dict | None = None
    load_options: dict = field(default_factory=dict)

    @property
    def type(self) -> FileType:
        return self.filetype or filetype_from_path(self.path)

    def is_pattern(self) -> bool:
        """True when the path has no suffix (reference ``base.py:109-115``)
        or contains glob metacharacters."""
        has_glob = any(ch in self.path for ch in "*?[")
        has_suffix = bool(pathlib.PurePosixPath(self.path.split("?")[0]).suffix)
        return has_glob or not has_suffix

    def is_local(self) -> bool:
        return "://" not in self.path or self.path.startswith("file://")

    def is_http(self) -> bool:
        return self.path.startswith(("http://", "https://"))

    def is_ftp(self) -> bool:
        return self.path.startswith("ftp://")

    def is_sftp(self) -> bool:
        return self.path.startswith("sftp://")

    def is_gdrive(self) -> bool:
        return self.path.startswith("gdrive://")

    def exists(self) -> bool:
        if self.is_local():
            p = self.path.removeprefix("file://")
            if self.is_pattern():
                import glob as _glob

                return bool(_glob.glob(p) or _glob.glob(os.path.join(p, "*")))
            return os.path.exists(p)
        return True  # remote existence is checked by the reader

    def _sftp_fetch(self) -> str:
        """Stage an ``sftp://[user@]host[:port]/abs/path`` file via the
        system OpenSSH ``sftp`` client in batch mode (reference
        ``files/locations/sftp.py`` used paramiko; the ssh binary is the
        more universal dependency and inherits ~/.ssh config, agents, and
        key auth for free). Non-interactive: BatchMode=yes, so password
        prompts fail fast — use key-based auth. Hooks:

        - ``load_options["sftp_server_command"]`` or env
          ``ASTRO_SFTP_SERVER_CMD``: passed as ``sftp -D`` (connect
          straight to an sftp-server command, no SSH transport — how the
          tests drive the real client against a local stub server);
        - env ``ASTRO_SFTP_SSH_OPTS``: extra ``-o`` options,
          comma-separated (e.g. ``IdentityFile=/keys/ci,Port=2222``).
        """
        import shutil as _shutil
        import subprocess

        if _shutil.which("sftp") is None:
            raise NotImplementedError(
                "sftp:// staging shells out to the OpenSSH 'sftp' client, "
                "which is not on PATH; install openssh-client or fetch the "
                "file out-of-band"
            )
        rest = self.path.removeprefix("sftp://")
        loc, _, remote = rest.partition("/")
        remote = "/" + remote
        # the batch script wraps the path in double quotes — a quote or
        # newline inside it would break parsing / inject extra commands
        if any(ch in remote for ch in ('"', "\n", "\r")):
            raise ValueError(
                f"sftp path contains unsupported characters: {remote!r}"
            )
        host = loc
        port = None
        hostonly = loc.rsplit("@", 1)[-1]
        if ":" in hostonly:
            host = loc[: len(loc) - len(hostonly)] + hostonly.rsplit(":", 1)[0]
            port = hostonly.rsplit(":", 1)[1]
        suffix = pathlib.PurePosixPath(remote).suffix or ".dat"
        fd, local = tempfile.mkstemp(suffix=suffix, prefix="astro_stage_")
        os.close(fd)
        cmd = ["sftp", "-q", "-b", "-"]
        server_cmd = self.load_options.get("sftp_server_command") or os.environ.get(
            "ASTRO_SFTP_SERVER_CMD"
        )
        if server_cmd:
            cmd += ["-D", server_cmd]
        else:
            cmd += ["-o", "BatchMode=yes"]
        for opt in os.environ.get("ASTRO_SFTP_SSH_OPTS", "").split(","):
            if opt.strip():
                cmd += ["-o", opt.strip()]
        if port:
            cmd += ["-P", port]
        cmd.append(host or "localhost")
        batch = f'get "{remote}" "{local}"\n'
        proc = subprocess.run(  # noqa: S603 - argv built above, no shell
            cmd, input=batch.encode(), capture_output=True, timeout=600
        )
        if proc.returncode != 0:
            _unlink_quiet(local)
            raise RuntimeError(
                f"sftp fetch of {self.path!r} failed "
                f"(exit {proc.returncode}): {proc.stderr.decode(errors='replace').strip()}"
            )
        return local

    def staged_path(self) -> str:
        """Path Spark can read. HTTP(S)/SFTP are downloaded to a temp file
        on the driver first (Spark can't glob or split these streams). The
        download is cached on the instance (one fetch per File) and
        deleted at interpreter exit."""
        if self.is_sftp():
            cached = getattr(self, "_staged", None)
            if cached is not None and os.path.exists(cached):
                return cached
            local = self._sftp_fetch()
            object.__setattr__(self, "_staged", local)
            atexit.register(_unlink_quiet, local)
            return local
        if self.is_gdrive() or self.is_http() or self.is_ftp():
            # driver-staged fetch (Spark can't glob/split http or ftp);
            # urllib handles both schemes — reference files/locations/http.py
            # and ftp.py. gdrive:// is rewritten to Drive's public-download
            # endpoint (anyone-with-the-link files only; private files need
            # the Drive API client, reference files/locations/google/gdrive.py).
            cached = getattr(self, "_staged", None)
            if cached is not None and os.path.exists(cached):
                return cached
            url = gdrive_to_url(self.path) if self.is_gdrive() else self.path
            suffix = pathlib.PurePosixPath(self.path.split("?")[0]).suffix or ".dat"
            fd, local = tempfile.mkstemp(suffix=suffix, prefix="astro_stage_")
            os.close(fd)
            urllib.request.urlretrieve(url, local)  # noqa: S310 - user-supplied source
            if self.is_gdrive() and _looks_like_html(local):
                _unlink_quiet(local)
                raise NotImplementedError(
                    f"gdrive file {self.path!r} returned an HTML page instead "
                    "of content — the file is private or requires a "
                    "confirmation step; share it as 'anyone with the link' or "
                    "use the Drive API out-of-band"
                )
            object.__setattr__(self, "_staged", local)
            atexit.register(_unlink_quiet, local)
            return local
        return self.path
