"""Deterministic synthetic `pages` corpus (FIXTURES.md §1).

The web-page transposition of the reference's fixture corpus
(``src/test/resources/METS/...`` + ALTO/charset edge cases in
``TextHelperTest.java``): a seeded generator producing the exact
``input_hint`` schema::

    url:string, warc_ts:timestamp[us,UTC], html:binary,
    text:string (mostly null), lang:string

Properties (everything derives from ``(n, seed, row index)`` — chunked
so generation is parallelizable and independent of file layout):

- Zipfian vocabulary → realistically skewed term frequencies
  (exercises head-term salting in the index shuffle);
- ~2% duplicated urls with a later ``warc_ts`` and changed body
  (exercises dedup-keep-latest, the URN-collision analog,
  ``AbstractWriteStrategy.java:158-195``);
- charset variety (utf-8 / iso-8859-1 / cp1252 / utf-16 BOM);
- the edge-case rows of FIXTURES.md §1 pinned at indices 0..N_EDGE-1.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = [
    "CORPUS_VERSION",
    "EDGE_CASES",
    "N_EDGE",
    "url_for",
    "ts_micros_for",
    "gen_pages_chunk",
    "gen_pages",
    "write_pages",
    "ensure_pages",
]

CORPUS_VERSION = 1
CHUNK = 8192
VOCAB_SIZE = 20000
_BASE_TS = 1735689600_000_000  # 2025-01-01T00:00:00Z in micros
_LANGS = ("en", "de", "fr", "")

_SYL = (
    "ba be bi bo bu da de di do du ka ke ki ko ku la le li lo lu ma me mi mo "
    "mu na ne ni no nu ra re ri ro ru sa se si so su ta te ti to tu va ve vi "
    "vo vu za ze zi zo zu"
).split()


def _word(i: int) -> str:
    """Deterministic pseudo-word for vocab rank i (head ranks shortest)."""
    s = _SYL
    n = len(s)
    w = s[i % n] + s[(i // n) % n]
    if i >= n * n:
        w += s[(i // (n * n)) % n]
    if i % 997 == 13:  # sprinkle accented forms → exercises NFC + unicode tokens
        w = w.replace("a", "á").replace("e", "é")
    return w


_VOCAB = np.array([_word(i) for i in range(VOCAB_SIZE)], dtype=object)

# --- FIXTURES.md §1 pinned edge-case rows (html bytes + lang) -----------
EDGE_CASES: list[bytes] = [
    # 0: non-UTF-8 via meta charset (FileTools.java:114-150 analog)
    '<html><head><meta charset="iso-8859-1"><title>Café München</title></head>'
    "<body><p>Übermäßig café naïve straße</p></body></html>".encode("iso-8859-1"),
    # 1: double-escaped entities (MetadataHelper.java:864-872 analog)
    b"<html><body><p>Fish &amp; Chips &amp;amp; more &lt;tags&gt; &#233;clair</p></body></html>",
    # 2: lone '<' without '>' (Jsoup workaround analog, TextHelper.java:486-494)
    b"<html><body><p>price < 100 and x <y is fine</p></body></html>",
    # 3: hyphenated word across a line break (TextHelper.java:312-319 analog)
    b"<html><body><p>This docu-\nment is hyphen-\nated badly</p></body></html>",
    # 4: nested block elements (ComposedBlock recursion analog)
    b"<html><body><div>outer<ul><li>one</li><li>two<p>deep</p></li></ul>tail</div></body></html>",
    # 5: combining characters requiring NFC (TextHelper.java:94-100 analog)
    "<html><body><p>café résumé</p></body></html>".encode(),
    # 6: script/style/comment content must not leak
    b"<html><head><style>p{color:red}</style><script>var x='hidden';</script></head>"
    b"<body><!-- secret comment --><p>visible only</p><noscript>nojs</noscript></body></html>",
    # 7: empty body
    b"<html><head><title></title></head><body></body></html>",
    # 8: whitespace-only body
    b"<html><body>   \n\t  </body></html>",
    # 9: placeholder — replaced by a ~1 MB page in gen (spill path)
    b"",
    # 10: utf-16 with BOM
    "<html><body><p>utf sixteen bytes wide</p></body></html>".encode("utf-16"),
    # 11: truncated / malformed html
    b"<html><body><p>trunca",
]
N_EDGE = len(EDGE_CASES)


def url_for(i: int) -> str:
    # ~2% of rows re-crawl an earlier url (later warc_ts wins dedup)
    if i >= 64 and i % 50 == 7:
        i = i - 13
    return f"https://site{i % 1000}.example/p/{i:09d}"


def ts_micros_for(i: int) -> int:
    return _BASE_TS + i * 1_000_000  # strictly increasing ⇒ later row wins


def _big_page(rng: np.random.Generator) -> bytes:
    ranks = np.minimum(rng.zipf(1.35, size=120_000) - 1, VOCAB_SIZE - 1)
    words = _VOCAB[ranks]
    paras = [
        "<p>" + " ".join(words[s : s + 60]) + "</p>" for s in range(0, len(words), 60)
    ]
    return ("<html><head><title>big page</title></head><body>" + "".join(paras) + "</body></html>").encode()


def gen_pages_chunk(chunk_id: int, n: int, seed: int) -> pa.Table:
    """Rows [chunk_id*CHUNK, min((chunk_id+1)*CHUNK, n)) of the corpus."""
    lo = chunk_id * CHUNK
    hi = min(lo + CHUNK, n)
    rng = np.random.default_rng((seed, CORPUS_VERSION, chunk_id))
    count = hi - lo
    lens = np.clip(rng.lognormal(4.6, 0.7, size=count), 8, 1500).astype(np.int64)
    total = int(lens.sum())
    ranks = np.minimum(rng.zipf(1.35, size=total) - 1, VOCAB_SIZE - 1)
    words = _VOCAB[ranks]
    offs = np.concatenate([[0], np.cumsum(lens)])
    charset_roll = rng.integers(0, 100, size=count)
    pre_extracted = rng.integers(0, 10, size=count)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    for j in range(count):
        i = lo + j
        urls.append(url_for(i))
        tss.append(ts_micros_for(i))
        langs.append(_LANGS[i % len(_LANGS)])
        if i < N_EDGE:
            htmls.append(_big_page(rng) if i == 9 else EDGE_CASES[i])
            texts.append(None)
            continue
        w = words[offs[j] : offs[j + 1]]
        title = " ".join(w[:5])
        body_parts = []
        for s in range(5, len(w), 55):
            chunk_words = " ".join(w[s : s + 55])
            k = (i + s) % 7
            if k == 0:
                body_parts.append(f"<h2>{chunk_words}</h2>")
            elif k == 1:
                body_parts.append(f"<div>{chunk_words}<br>next line</div>")
            else:
                body_parts.append(f"<p>{chunk_words}</p>")
        if i >= 64 and i % 50 == 7:
            body_parts.append("<p>updated crawl version two</p>")
        enc, meta = "utf-8", '<meta charset="utf-8">'
        if charset_roll[j] == 0:
            enc, meta = "iso-8859-1", '<meta charset="iso-8859-1">'
            body_parts.append("<p>straße café übermäßig</p>")
        elif charset_roll[j] == 1:
            enc, meta = "cp1252", '<meta http-equiv="Content-Type" content="text/html; charset=windows-1252">'
        html = f"<html><head>{meta}<title>{title}</title></head><body>{''.join(body_parts)}</body></html>"
        htmls.append(html.encode(enc, "replace"))
        texts.append(" ".join(w) if pre_extracted[j] == 3 else None)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def gen_pages(n: int, seed: int = 42) -> pa.Table:
    chunks = [gen_pages_chunk(c, n, seed) for c in range((n + CHUNK - 1) // CHUNK)]
    return pa.concat_tables(chunks)


def write_pages(out_dir: str, n: int, seed: int = 42, rows_per_file: int = 4 * CHUNK) -> list[str]:
    """Write the corpus as a sharded parquet directory; returns file paths.

    Generation is chunk-deterministic, so when a Ray session is live and
    the corpus is large, chunks are generated as parallel Ray tasks —
    the file contents are identical either way.
    """
    os.makedirs(out_dir, exist_ok=True)
    n_chunks = (n + CHUNK - 1) // CHUNK
    chunks_per_file = max(1, rows_per_file // CHUNK)

    use_ray = False
    if n >= 16 * CHUNK:
        try:
            import ray

            use_ray = ray.is_initialized()
        except ImportError:
            pass

    def file_chunk_ids(fileno: int) -> list[int]:
        return list(range(fileno * chunks_per_file, min((fileno + 1) * chunks_per_file, n_chunks)))

    n_files = (n_chunks + chunks_per_file - 1) // chunks_per_file
    paths = [os.path.join(out_dir, f"pages-{f:05d}.parquet") for f in range(n_files)]
    if use_ray:
        import ray

        @ray.remote
        def gen_file(path: str, cids: list[int]) -> str:
            tables = [gen_pages_chunk(c, n, seed) for c in cids]
            pq.write_table(pa.concat_tables(tables), path)
            return path

        ray.get([gen_file.remote(p, file_chunk_ids(f)) for f, p in enumerate(paths)])
    else:
        for f, p in enumerate(paths):
            tables = [gen_pages_chunk(c, n, seed) for c in file_chunk_ids(f)]
            pq.write_table(pa.concat_tables(tables), p)
    return paths


def ensure_pages(n: int, seed: int = 42, base: str = "/tmp/gvi_corpus") -> str:
    """Idempotent cached corpus directory for tests/bench."""
    out = os.path.join(base, f"pages_n{n}_s{seed}_v{CORPUS_VERSION}")
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        write_pages(out, n, seed)
        with open(marker, "w") as f:
            f.write("ok")
    return out
