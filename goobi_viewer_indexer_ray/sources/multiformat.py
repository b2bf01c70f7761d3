"""Multi-format ingest with content-sniffing dispatch (S2).

Transposes the reference's hotfolder format dispatcher: every incoming
file is routed by CONTENT, not by file name —
``Hotfolder.handleSourceFile`` (``helper/Hotfolder.java:588-792``)
sniffs each record and dispatches to the matching indexer subclass via
``JDomXP.determineFileFormat`` (``helper/JDomXP.java:566``), which
reads the XML root element/namespace.

Here the corpus directory may mix three physical formats holding the
same logical ``documents`` schema — Parquet, JSONL, and flat XML — and
:func:`read_any` sniffs each file's magic bytes and routes it into one
unified Ray Dataset with an extra ``fmt`` provenance column.  Files no
sniffer claims are skipped and reported (the reference moves unknown
files to the error folder rather than crashing the daemon).

Scale notes: sniffing reads only the first 8 bytes of each file
(driver-side, like the hotfolder scan); each format's files are read
by the matching Ray datasource — Parquet natively, JSONL via
``read_text`` + a vectorized per-batch ``json.loads`` map, XML via
``read_binary_files`` + a per-file ElementTree parse inside
``flat_map`` — so record decode happens IN the cluster, only paths
pass through the driver.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

__all__ = ["sniff_format", "read_any", "write_mixed_corpus", "DOC_COLUMNS"]

DOC_COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]

_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
        ("fmt", pa.string()),
    ]
)


def sniff_format(head: bytes) -> str:
    """First bytes → format tag ('parquet' | 'jsonl' | 'xml' |
    'unknown') — the ``determineFileFormat`` analog (magic/root
    sniffing, never the file extension)."""
    if head[:4] == b"PAR1":
        return "parquet"
    stripped = head.lstrip()
    if stripped[:1] == b"<":
        return "xml"
    if stripped[:1] == b"{":
        return "jsonl"
    return "unknown"


def _sniff_file(path: str) -> str:
    with open(path, "rb") as f:
        return sniff_format(f.read(8))


def _rows_table(rows: list[dict], fmt: str) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([int(r["doc_id"]) for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "source": pa.array([r["source"] for r in rows], pa.string()),
            "n_chars": pa.array([int(r["n_chars"]) for r in rows], pa.int64()),
            "fmt": pa.array([fmt] * len(rows), pa.string()),
        }
    )


def read_any(dir_path: str):
    """Sniff every file under ``dir_path`` and union the per-format
    Datasets into one with the unified schema + ``fmt`` column.
    Returns ``(dataset, skipped_paths)``."""
    import ray.data as rd

    by_fmt: dict[str, list[str]] = {}
    skipped: list[str] = []
    for name in sorted(os.listdir(dir_path)):
        path = os.path.join(dir_path, name)
        # "_"/"." prefixes are metadata by parquet-dir convention
        # (_SUCCESS, _DONE) — not records, not worth reporting
        if not os.path.isfile(path) or name.startswith(("_", ".")):
            continue
        fmt = _sniff_file(path)
        if fmt == "unknown":
            skipped.append(path)
        else:
            by_fmt.setdefault(fmt, []).append(path)

    parts = []
    if "parquet" in by_fmt:

        def tag_parquet(t: pa.Table) -> pa.Table:
            return t.select(DOC_COLUMNS).append_column(
                "fmt", pa.array(["parquet"] * t.num_rows, pa.string())
            )

        parts.append(
            rd.read_parquet(
                by_fmt["parquet"],
                columns=DOC_COLUMNS,
                file_extensions=None,
                # hotfolder batches are small files: one block per file
                # keeps the downstream union/groupby off the pathological
                # many-near-empty-blocks regime (see merge_sources note)
                override_num_blocks=len(by_fmt["parquet"]),
            ).map_batches(tag_parquet, batch_format="pyarrow")
        )
    if "jsonl" in by_fmt:

        def parse_jsonl(t: pa.Table) -> pa.Table:
            rows = [json.loads(line) for line in t.column("text").to_pylist() if line]
            return _rows_table(rows, "jsonl")

        parts.append(
            rd.read_text(
                by_fmt["jsonl"], override_num_blocks=len(by_fmt["jsonl"])
            ).map_batches(parse_jsonl, batch_format="pyarrow")
        )
    if "xml" in by_fmt:

        def parse_xml(row: dict):
            import xml.etree.ElementTree as ET

            root = ET.fromstring(bytes(row["bytes"]))
            out = []
            for el in root.iter("doc"):
                out.append(
                    {
                        "doc_id": int(el.findtext("doc_id")),
                        "text": el.findtext("text") or "",
                        "lang": el.findtext("lang") or "",
                        "source": el.findtext("source") or "",
                        "n_chars": int(el.findtext("n_chars")),
                        "fmt": "xml",
                    }
                )
            return out

        parts.append(rd.read_binary_files(by_fmt["xml"]).flat_map(parse_xml))

    if not parts:
        return rd.from_arrow(_OUT_SCHEMA.empty_table()), skipped
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds, skipped


def write_mixed_corpus(documents_parquet: str, out_dir: str, *,
                       files_per_format: int = 4) -> str:
    """Deterministically re-materialize a ``documents`` table as a
    mixed-format directory: rows routed by ``doc_id % 3`` into Parquet
    (0), JSONL (1), and XML (2), each format split over several files
    (plus one deliberately-unreadable decoy the sniffing reader must
    skip).  Built into a temp dir + atomic rename (concurrency-safe,
    same pattern as the catalog's LSH cache)."""
    import xml.etree.ElementTree as ET

    import pyarrow.parquet as pq

    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return out_dir
    tmp = f"{out_dir}.tmp.{os.getpid()}.{os.urandom(4).hex()}"
    os.makedirs(tmp, exist_ok=True)
    t = pq.read_table(documents_parquet, columns=DOC_COLUMNS)
    ids = t.column("doc_id").to_numpy()
    rows = t.to_pylist()

    def shard_rows(fmt_mod: int, fi: int) -> list[dict]:
        return [
            r
            for r, d in zip(rows, ids)
            if d % 3 == fmt_mod and (d // 3) % files_per_format == fi
        ]

    for fi in range(files_per_format):
        sel = [i for i, d in enumerate(ids) if d % 3 == 0 and (d // 3) % files_per_format == fi]
        pq.write_table(t.take(sel), os.path.join(tmp, f"chunk-pq-{fi:02d}.dat"))

        with open(os.path.join(tmp, f"chunk-jl-{fi:02d}.dat"), "w") as f:
            for r in shard_rows(1, fi):
                f.write(json.dumps({k: r[k] for k in DOC_COLUMNS}) + "\n")

        root = ET.Element("docs")
        for r in shard_rows(2, fi):
            el = ET.SubElement(root, "doc")
            for k in DOC_COLUMNS:
                ET.SubElement(el, k).text = str(r[k])
        xml_bytes = ET.tostring(root, encoding="utf-8", xml_declaration=True)
        # XML parsers normalize raw \r / \r\n to \n on read-back (XML
        # 1.0 §2.11 end-of-line handling), which would break the
        # byte-exact text round-trip for CR-bearing documents; a
        # character reference survives.  CR only ever appears inside
        # text nodes here (fixed element names, no attributes), so a
        # whole-document byte replace is safe.
        xml_bytes = xml_bytes.replace(b"\r", b"&#13;")
        with open(os.path.join(tmp, f"chunk-xm-{fi:02d}.dat"), "wb") as f:
            f.write(xml_bytes)

    with open(os.path.join(tmp, "decoy.bin"), "wb") as f:
        f.write(b"\x00\x01garbage not a record file")
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(documents_parquet)
    import shutil

    # a marker-less out_dir is a crashed builder's partial tree: clear
    # it so the rename can land (same guard as the catalog LSH cache)
    if os.path.isdir(out_dir) and not os.path.exists(os.path.join(out_dir, "_DONE")):
        shutil.rmtree(out_dir, ignore_errors=True)
    try:
        os.rename(tmp, out_dir)
    except OSError:  # a concurrent builder won the rename
        shutil.rmtree(tmp, ignore_errors=True)
    return out_dir
