"""Minimal read-only SFTP v3 server over stdin/stdout (RFC draft
draft-ietf-secsh-filexfer-02, the version OpenSSH speaks).

Used by the SFTP location tests: ``sftp -D "<python> <this file>"``
connects the REAL OpenSSH client directly to this process with no SSH
transport in between, so the client's actual protocol behavior (version
negotiation, stat-before-open, pipelined READs) exercises our
``sftp://`` staging path end-to-end without a network or an sshd.

Serves the local filesystem as-is. Implements INIT, REALPATH, STAT,
LSTAT, FSTAT, OPEN (read-only), READ, CLOSE; everything else returns
SSH_FX_OP_UNSUPPORTED.
"""

from __future__ import annotations

import os
import struct
import sys

FXP_INIT = 1
FXP_VERSION = 2
FXP_OPEN = 3
FXP_CLOSE = 4
FXP_READ = 5
FXP_LSTAT = 7
FXP_FSTAT = 8
FXP_OPENDIR = 11
FXP_READDIR = 12
FXP_REALPATH = 16
FXP_STAT = 17
FXP_STATUS = 101
FXP_HANDLE = 102
FXP_DATA = 103
FXP_NAME = 104
FXP_ATTRS = 105

FX_OK = 0
FX_EOF = 1
FX_NO_SUCH_FILE = 2
FX_FAILURE = 4
FX_OP_UNSUPPORTED = 8

ATTR_SIZE = 0x01
ATTR_PERMISSIONS = 0x04


def _s(b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + b


def _attrs(path: str | None = None, st=None) -> bytes:
    if st is None:
        try:
            st = os.stat(path)
        except OSError:
            return struct.pack(">I", 0)
    return struct.pack(
        ">IQI", ATTR_SIZE | ATTR_PERMISSIONS, st.st_size, st.st_mode
    )


def main() -> None:
    inp = sys.stdin.buffer
    out = sys.stdout.buffer
    handles: dict[bytes, object] = {}
    n_handles = 0

    def send(ptype: int, payload: bytes) -> None:
        out.write(struct.pack(">IB", len(payload) + 1, ptype) + payload)
        out.flush()

    def status(rid: int, code: int, msg: str = "") -> None:
        send(
            FXP_STATUS,
            struct.pack(">II", rid, code) + _s(msg.encode()) + _s(b""),
        )

    while True:
        head = inp.read(4)
        if len(head) < 4:
            return
        (plen,) = struct.unpack(">I", head)
        pkt = inp.read(plen)
        if len(pkt) < plen:
            return
        ptype = pkt[0]
        body = pkt[1:]

        if ptype == FXP_INIT:
            send(FXP_VERSION, struct.pack(">I", 3))
            continue

        (rid,) = struct.unpack(">I", body[:4])
        rest = body[4:]

        def read_str(buf: bytes) -> tuple[bytes, bytes]:
            (n,) = struct.unpack(">I", buf[:4])
            return buf[4:4 + n], buf[4 + n:]

        if ptype == FXP_REALPATH:
            raw, _ = read_str(rest)
            resolved = os.path.realpath(raw.decode() or ".")
            send(
                FXP_NAME,
                struct.pack(">II", rid, 1)
                + _s(resolved.encode())
                + _s(resolved.encode())
                + struct.pack(">I", 0),
            )
        elif ptype in (FXP_STAT, FXP_LSTAT):
            raw, _ = read_str(rest)
            path = raw.decode()
            if not os.path.exists(path):
                status(rid, FX_NO_SUCH_FILE, "no such file")
            else:
                send(FXP_ATTRS, struct.pack(">I", rid) + _attrs(path))
        elif ptype == FXP_OPEN:
            raw, rest2 = read_str(rest)
            path = raw.decode()
            try:
                f = open(path, "rb")
            except OSError as e:
                status(rid, FX_NO_SUCH_FILE, str(e))
                continue
            n_handles += 1
            h = str(n_handles).encode()
            handles[h] = f
            send(FXP_HANDLE, struct.pack(">I", rid) + _s(h))
        elif ptype == FXP_FSTAT:
            h, _ = read_str(rest)
            f = handles.get(h)
            if f is None:
                status(rid, FX_FAILURE, "bad handle")
            else:
                send(
                    FXP_ATTRS,
                    struct.pack(">I", rid) + _attrs(st=os.fstat(f.fileno())),
                )
        elif ptype == FXP_READ:
            h, rest2 = read_str(rest)
            offset, n = struct.unpack(">QI", rest2[:12])
            f = handles.get(h)
            if f is None:
                status(rid, FX_FAILURE, "bad handle")
                continue
            f.seek(offset)
            data = f.read(n)
            if not data:
                status(rid, FX_EOF, "eof")
            else:
                send(FXP_DATA, struct.pack(">I", rid) + _s(data))
        elif ptype == FXP_CLOSE:
            h, _ = read_str(rest)
            f = handles.pop(h, None)
            if f is not None:
                f.close()
            status(rid, FX_OK)
        else:
            status(rid, FX_OP_UNSUPPORTED, f"type {ptype} unsupported")


if __name__ == "__main__":
    main()
