"""Minimal WARC/1.0 ingest — the container format Common-Crawl ships
(the ``input_hint`` pages table is "Common-Crawl-style"; this is the
reader that would sit in front of it).  The reference's ingest reads
METS/LIDO/EAD files from a hotfolder (``helper/Hotfolder.java``); the
web-corpus transposition reads WARC response records from a crawl
directory.

Format subset (what CC response records actually use):

    WARC/1.0\\r\\n
    <Name>: <value>\\r\\n ...                (header block)
    \\r\\n
    <Content-Length bytes of payload>
    \\r\\n\\r\\n                              (record separator)

Parsing is Content-Length-FRAMED — the payload is sliced by byte
count, never scanned for a terminator — so any payload bytes
(including ``\\r\\n`` and binary) round-trip exactly.  Header names
are case-insensitive per the spec.

Scale shape: the FILE is the parallel unit (exactly how Common Crawl
is processed — one ~1 GB WARC per task): ``read_warc_dir`` is
``ray.data.read_binary_files`` over the directory followed by one
``map_batches`` that parses each file's records; non-WARC files are
skipped (sniffed by magic), truncated/corrupt tails stop that file's
parse loudly-by-default (``strict=False`` downgrades to
skip-remainder, the error-folder analog).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

__all__ = ["write_warc_corpus", "parse_warc_bytes", "read_warc_dir",
           "gunzip_members"]

_MAGIC = b"WARC/1.0\r\n"


def _record_bytes(url: str, rec_id: int, date: str, lang: str,
                  payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Identified-Content-Language: {lang}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def write_warc_corpus(documents_parquet: str, out_dir: str, *,
                      num_files: int = 8, gzip_records: bool = False) -> str:
    """Deterministically re-materialize a ``documents`` table as a
    directory of ``.warc`` files (rows routed by ``doc_id %
    num_files``) plus one non-WARC decoy the reader must skip.
    ``gzip_records=True`` writes ``.warc.gz`` files with EACH record
    as its own gzip member, concatenated — the exact Common Crawl
    on-disk layout (per-record members are what make CC offsets
    seekable).  Temp-dir + atomic rename (concurrency-safe, the
    mixed-corpus writer's pattern)."""
    import gzip as _gzip
    import shutil

    import pyarrow.parquet as pq

    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return out_dir
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    t = pq.read_table(documents_parquet, columns=["doc_id", "text", "lang"])
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    route = ids % num_files
    ext = ".warc.gz" if gzip_records else ".warc"
    for f in range(num_files):
        idx = np.flatnonzero(route == f)
        with open(os.path.join(tmp, f"crawl-{f:03d}{ext}"), "wb") as fh:
            for i in idx:
                did = int(ids[i])
                rec = _record_bytes(
                    f"https://example-{did % 50}.com/page/{did}",
                    did,
                    f"2024-01-{did % 28 + 1:02d}T00:00:00Z",
                    langs[i] or "",
                    (texts[i] or "").encode("utf-8"),
                )
                fh.write(_gzip.compress(rec, mtime=0) if gzip_records
                         else rec)
    with open(os.path.join(tmp, "README.txt"), "wb") as fh:
        fh.write(b"not a warc file - the reader must skip this decoy\n")
    with open(os.path.join(tmp, "_DONE"), "w") as fh:
        fh.write("ok")
    shutil.rmtree(out_dir, ignore_errors=True)
    try:
        os.rename(tmp, out_dir)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # concurrent winner
    return out_dir


def gunzip_members(buf: bytes) -> tuple[bytes, int]:
    """Concatenated-gzip-member stream → (decompressed bytes,
    member count).  Member-by-member ``zlib.decompressobj`` loop so
    the PER-RECORD framing (the Common Crawl seekability property)
    is observable — ``gzip.decompress`` would hide the boundaries."""
    import zlib

    out, members = [], 0
    rest = buf
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)  # 31 = gzip-wrapped
        out.append(d.decompress(rest))
        if not d.eof:
            raise ValueError("truncated gzip member")
        members += 1
        rest = d.unused_data
    if rest:
        raise ValueError(f"{len(rest)} trailing non-gzip bytes")
    return b"".join(out), members


def parse_warc_bytes(buf: bytes, *, strict: bool = True) -> dict:
    """One WARC file's bytes → dict of column lists ``(doc_id, url,
    warc_date, lang, text)``.  ``.warc.gz`` streams (gzip magic) are
    decompressed member-by-member first; in strict mode the member
    count must equal the record count — one member per record, the
    Common Crawl invariant.  Returns ``None`` if the file is neither
    WARC nor gzipped WARC (magic sniff — the decoy path)."""
    n_members = None
    if buf[:2] == b"\x1f\x8b":
        try:
            buf, n_members = gunzip_members(bytes(buf))
        except ValueError:
            if strict:
                raise
            return None
    if not buf.startswith(_MAGIC):
        return None
    cols = {"doc_id": [], "url": [], "warc_date": [], "lang": [],
            "text": []}
    pos, n = 0, len(buf)
    while pos < n:
        if buf[pos:pos + len(_MAGIC)] != _MAGIC:
            if strict:
                raise ValueError(f"bad WARC record magic at byte {pos}")
            break
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            if strict:
                raise ValueError("truncated WARC header")
            break
        headers = {}
        for line in buf[pos + len(_MAGIC):hdr_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError("missing/bad Content-Length")
            break
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end + 4 > n:
            if strict:
                raise ValueError("truncated WARC payload")
            break
        rid = headers.get(b"warc-record-id", b"")
        cols["doc_id"].append(
            int(rid.split(b"uuid:")[-1].rstrip(b">")) if b"uuid:" in rid
            else -1)
        cols["url"].append(
            headers.get(b"warc-target-uri", b"").decode("utf-8"))
        cols["warc_date"].append(
            headers.get(b"warc-date", b"").decode("ascii"))
        cols["lang"].append(
            headers.get(b"warc-identified-content-language",
                        b"").decode("ascii"))
        cols["text"].append(
            buf[body_start:body_end].decode("utf-8"))
        pos = body_end + 4
    if strict and n_members is not None and n_members != len(cols["doc_id"]):
        raise ValueError(
            f"{n_members} gzip members != {len(cols['doc_id'])} records "
            "(Common Crawl framing is one member per record)")
    return cols


def read_warc_dir(path: str, *, strict: bool = True):
    """Directory of WARC files → one Dataset ``(doc_id, url,
    warc_date, lang, text)``; non-WARC files are sniffed out and
    skipped.  The file is the parallel unit (the CC processing
    shape)."""
    import ray.data

    files = ray.data.read_binary_files(path, include_paths=True)

    def parse(t: pa.Table) -> pa.Table:
        out = {"doc_id": [], "url": [], "warc_date": [], "lang": [],
               "text": []}
        for buf in t.column("bytes"):
            cols = parse_warc_bytes(buf.as_py(), strict=strict)
            if cols is None:
                continue
            for k in out:
                out[k].extend(cols[k])
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "url": pa.array(out["url"], pa.string()),
                "warc_date": pa.array(out["warc_date"], pa.string()),
                "lang": pa.array(out["lang"], pa.string()),
                "text": pa.array(out["text"], pa.string()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")
