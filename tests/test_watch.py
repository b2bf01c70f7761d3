"""Continuous-ingest daemon (`watch` — Hotfolder.java:431-503 /
SolrIndexerDaemon.java:247-259 analog): snapshot-diff poll loop with
file-stability gating, priority re-index commands, delete command
files, removed-shard deletion, and clean-partition byte-identity."""

import datetime
import glob
import hashlib
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from goobi_viewer_indexer_ray.functions.hashing import part_for
from tests.conftest import NUM_PARTS

N0 = 120
SEED = 42
TS = datetime.datetime(2031, 1, 1, tzinfo=datetime.timezone.utc)


def _filehash(path):
    return hashlib.blake2b(open(path, "rb").read(), digest_size=12).hexdigest()


def _write_shard(path, urls, tag, ts=TS):
    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array([ts] * len(urls), pa.timestamp("us", tz="UTC")),
                "html": pa.array(
                    [f"<html><body><p>{tag} doc {i} zyzzyva</p></body></html>".encode()
                     for i in range(len(urls))],
                    pa.binary(),
                ),
                "text": pa.array([None] * len(urls), pa.string()),
                "lang": pa.array(["en"] * len(urls), pa.string()),
            }
        ),
        path,
    )


def _docs_urls(out):
    urls = []
    for f in glob.glob(os.path.join(out, "docs", "part=*", "data.parquet")):
        urls.extend(pq.read_table(f, columns=["url"]).column("url").to_pylist())
    return sorted(urls)


def _clean_part_hashes(out, dirty_parts):
    return {
        p: _filehash(os.path.join(out, "docs", f"part={p:05d}", "data.parquet"))
        for p in range(NUM_PARTS)
        if p not in dirty_parts
        and os.path.exists(os.path.join(out, "docs", f"part={p:05d}", "data.parquet"))
    }


@pytest.fixture(scope="module")
def hot(ray_session, tmp_path_factory):
    """Hotfolder + empty out dir; initial corpus arrives via watch."""
    from goobi_viewer_indexer_ray.sources.corpus import write_pages

    folder = str(tmp_path_factory.mktemp("hotfolder"))
    out = str(tmp_path_factory.mktemp("watch") / "out")
    os.makedirs(out, exist_ok=True)
    write_pages(folder, N0, seed=SEED, rows_per_file=64)
    return folder, out


def test_watch_lifecycle(hot):
    from goobi_viewer_indexer_ray.pipelines.watch import watch_once

    folder, out = hot

    # ---- tick 1: everything new → stability-pending, nothing indexed
    r1 = watch_once(out, folder)
    assert r1["indexed"] == [] and r1["pending"]
    assert not os.path.exists(os.path.join(out, "docs_manifest.json"))

    # ---- tick 2: stable → bootstrap build
    r2 = watch_once(out, folder)
    assert len(r2["indexed"]) == len(r1["pending"])
    base_urls = _docs_urls(out)
    assert len(base_urls) > 0

    # ---- tick 3: no changes → no-op
    r3 = watch_once(out, folder)
    assert r3 == {"reindexed": [], "indexed": [], "deleted_urls": 0,
                  "purged_urls": 0, "updated_docs": [], "acknowledged": [],
                  "config_reindexed": [], "pending": [], "removed": [],
                  "errors": []}

    # ---- new shard dropped between polls ----
    new_urls = [f"https://watchnew.example/{i}" for i in range(6)]
    _write_shard(os.path.join(folder, "delta-a.parquet"), new_urls, "fresh")
    dirty = {part_for(u, NUM_PARTS) for u in new_urls}
    pre = _clean_part_hashes(out, dirty)
    assert pre, "need at least one clean part for the byte-identity check"

    r4 = watch_once(out, folder)
    assert "delta-a.parquet" in r4["pending"] and r4["indexed"] == []
    r5 = watch_once(out, folder)
    assert r5["indexed"] == ["delta-a.parquet"]
    got = _docs_urls(out)
    assert set(new_urls) <= set(got)
    assert _clean_part_hashes(out, dirty) == pre  # clean parts untouched

    # ---- growing upload: file changes between the two sighting polls
    grow = os.path.join(folder, "delta-b.parquet")
    grow_urls = [f"https://watchgrow.example/{i}" for i in range(3)]
    _write_shard(grow, grow_urls[:2], "growing")
    r6 = watch_once(out, folder)
    assert "delta-b.parquet" in r6["pending"]
    _write_shard(grow, grow_urls, "grown")  # still changing → wait again
    r7 = watch_once(out, folder)
    assert "delta-b.parquet" in r7["pending"] and r7["indexed"] == []
    r8 = watch_once(out, folder)
    assert r8["indexed"] == ["delta-b.parquet"]
    assert set(grow_urls) <= set(_docs_urls(out))

    # ---- .delete command file ----
    victim = new_urls[0]
    with open(os.path.join(folder, "cmd1.delete"), "w") as f:
        f.write(victim + "\n")
    watch_once(out, folder)  # stability tick for the command file
    r9 = watch_once(out, folder)
    assert r9["deleted_urls"] == 1
    assert victim not in _docs_urls(out)

    # command file is processed exactly once (no re-delete churn)
    r10 = watch_once(out, folder)
    assert r10["deleted_urls"] == 0

    # ---- removed shard: its exclusive urls deleted, shared ones kept
    os.remove(grow)
    r11 = watch_once(out, folder)
    assert r11["removed"] == ["delta-b.parquet"]
    assert r11["deleted_urls"] == len(grow_urls)
    after = set(_docs_urls(out))
    assert not (set(grow_urls) & after)
    assert set(new_urls[1:]) <= after  # other shard's docs survive


def test_watch_reindex_priority(ray_session, tmp_path_factory):
    from goobi_viewer_indexer_ray.pipelines.watch import watch_once

    folder = str(tmp_path_factory.mktemp("hot2"))
    out = str(tmp_path_factory.mktemp("watch2") / "out")
    os.makedirs(out, exist_ok=True)
    urls = [f"https://reidx.example/{i}" for i in range(4)]
    _write_shard(os.path.join(folder, "s0.parquet"), urls, "v1")
    watch_once(out, folder)
    watch_once(out, folder)  # bootstrap
    assert set(urls) <= set(_docs_urls(out))

    # rewrite shard content with SAME mtime-insensitive diff + a
    # .reindex command: the command forces re-ingest even though we
    # restore the recorded fingerprint in the ledger
    _write_shard(os.path.join(folder, "s0.parquet"), urls, "v2",
                 ts=TS + datetime.timedelta(days=1))
    with open(os.path.join(folder, "go.reindex"), "w") as f:
        f.write("s0.parquet\n")
    r1 = watch_once(out, folder)
    assert "go.reindex" in r1["pending"]
    r2 = watch_once(out, folder)
    # priority path: the shard goes through the reindex lane, not the
    # regular new/changed lane
    assert r2["reindexed"] == ["s0.parquet"]
    assert "s0.parquet" not in r2["indexed"]
    # the v2 content is live
    txt = []
    for f in glob.glob(os.path.join(out, "docs", "part=*", "data.parquet")):
        txt.extend(pq.read_table(f, columns=["text"]).column("text").to_pylist())
    assert any("v2 doc" in t for t in txt)


def test_watch_loop_injectable_sleep(ray_session, tmp_path_factory):
    from goobi_viewer_indexer_ray.pipelines.watch import watch

    folder = str(tmp_path_factory.mktemp("hot3"))
    out = str(tmp_path_factory.mktemp("watch3") / "out")
    os.makedirs(out, exist_ok=True)
    _write_shard(os.path.join(folder, "s0.parquet"),
                 ["https://loop.example/0"], "loop")
    naps = []
    reports = list(watch(out, folder, interval_s=7.5, max_polls=2,
                         sleep=naps.append))
    assert len(reports) == 2
    assert naps == [7.5]  # no trailing sleep after the last poll
    assert reports[1]["indexed"] == ["s0.parquet"]


def test_watch_state_survives_restart(ray_session, tmp_path_factory):
    """A new watch_once call (fresh state load) must not re-ingest."""
    from goobi_viewer_indexer_ray.pipelines.watch import load_state, watch_once

    folder = str(tmp_path_factory.mktemp("hot4"))
    out = str(tmp_path_factory.mktemp("watch4") / "out")
    os.makedirs(out, exist_ok=True)
    _write_shard(os.path.join(folder, "s0.parquet"),
                 ["https://restart.example/0"], "x")
    watch_once(out, folder)
    watch_once(out, folder)
    man = os.path.join(out, "index_manifest.json")
    h = _filehash(man)
    # "restart": state reloaded from disk, nothing new → full no-op
    r = watch_once(out, folder)
    assert r["indexed"] == [] and r["pending"] == []
    assert _filehash(man) == h
    st = load_state(out)
    assert "s0.parquet" in st["files"]


def test_removed_shard_delete_retries_after_failure(ray_session, tmp_path_factory, monkeypatch):
    """A failed delete keeps sidecar + ledger entry so the next tick
    retries with the evidence intact (review finding: sidecar was
    removed before the delete committed)."""
    from goobi_viewer_indexer_ray.pipelines import watch as W

    folder = str(tmp_path_factory.mktemp("hot5"))
    out = str(tmp_path_factory.mktemp("watch5") / "out")
    os.makedirs(out, exist_ok=True)
    urls = [f"https://retry.example/{i}" for i in range(3)]
    _write_shard(os.path.join(folder, "s0.parquet"), urls, "x")
    _write_shard(os.path.join(folder, "keep.parquet"),
                 ["https://retry.example/keep"], "y")
    W.watch_once(out, folder)
    W.watch_once(out, folder)  # bootstrap
    os.remove(os.path.join(folder, "s0.parquet"))

    real = W.apply_updates
    boom = {"n": 0}

    def flaky(*a, **kw):
        if kw.get("reason") == "watch-delete" and boom["n"] == 0:
            boom["n"] += 1
            raise RuntimeError("injected delete failure")
        return real(*a, **kw)

    monkeypatch.setattr(W, "apply_updates", flaky)
    with pytest.raises(RuntimeError):
        W.watch_once(out, folder)
    # evidence intact: sidecar still on disk, ledger still lists s0
    assert os.path.exists(W._sidecar_path(out, "s0.parquet"))
    from goobi_viewer_indexer_ray.pipelines.watch import load_state

    assert "s0.parquet" in load_state(out)["files"]
    # retry succeeds and cleans up
    r = W.watch_once(out, folder)
    assert r["removed"] == ["s0.parquet"] and r["deleted_urls"] == 3
    assert not os.path.exists(W._sidecar_path(out, "s0.parquet"))
    assert not (set(urls) & set(_docs_urls(out)))


def test_reindex_waits_for_growing_target(ray_session, tmp_path_factory):
    """A .reindex naming a still-changing data file defers until the
    target stabilizes (review finding: targets bypassed the guard)."""
    from goobi_viewer_indexer_ray.pipelines.watch import watch_once

    folder = str(tmp_path_factory.mktemp("hot6"))
    out = str(tmp_path_factory.mktemp("watch6") / "out")
    os.makedirs(out, exist_ok=True)
    _write_shard(os.path.join(folder, "s0.parquet"),
                 ["https://g.example/0"], "v1")
    watch_once(out, folder)
    watch_once(out, folder)  # bootstrap with v1

    # new (changed) target + the command arrive in the same tick
    _write_shard(os.path.join(folder, "s0.parquet"),
                 ["https://g.example/0"], "v2",
                 ts=TS + datetime.timedelta(days=1))
    with open(os.path.join(folder, "go.reindex"), "w") as f:
        f.write("s0.parquet\n")
    r1 = watch_once(out, folder)  # both first-seen → pending
    assert r1["reindexed"] == []
    r2 = watch_once(out, folder)  # command stable, target stable now
    assert r2["reindexed"] == ["s0.parquet"]


def test_predelete_command_not_lost_before_build(ray_session, tmp_path_factory):
    """A .delete arriving before anything is built must NOT be
    consumed — it applies once the bootstrap exists (review finding:
    it was marked processed and silently discarded)."""
    from goobi_viewer_indexer_ray.pipelines.watch import watch_once

    folder = str(tmp_path_factory.mktemp("hot7"))
    out = str(tmp_path_factory.mktemp("watch7") / "out")
    os.makedirs(out, exist_ok=True)
    victim = "https://pre.example/0"
    with open(os.path.join(folder, "cmd.delete"), "w") as f:
        f.write(victim + "\n")
    watch_once(out, folder)
    r = watch_once(out, folder)  # stable but unbuilt → untouched
    assert r["deleted_urls"] == 0
    _write_shard(os.path.join(folder, "s0.parquet"),
                 [victim, "https://pre.example/1"], "z")
    watch_once(out, folder)
    r2 = watch_once(out, folder)  # bootstrap ingests both urls
    assert r2["indexed"] == ["s0.parquet"]
    r3 = watch_once(out, folder)  # now the old command fires
    assert r3["deleted_urls"] == 1
    assert victim not in _docs_urls(out)


def test_watch_docupdate_purge_updated(ray_session, tmp_path_factory):
    """Round-4 verdict #2: the three remaining hotfolder command
    suffixes (Hotfolder.java:477 glob, :550-551 dispatch).
    .docupdate → update_doc upsert; .purge → delete WITHOUT trace
    rows; .UPDATED → exactly-once acknowledgement, no index mutation.
    All exactly-once via the ledger; clean partitions byte-untouched."""
    import base64

    from goobi_viewer_indexer_ray.pipelines.watch import watch_once

    folder = str(tmp_path_factory.mktemp("hot8"))
    out = str(tmp_path_factory.mktemp("watch8") / "out")
    os.makedirs(out, exist_ok=True)
    urls = [f"https://cmd.example/{i}" for i in range(8)]
    _write_shard(os.path.join(folder, "s0.parquet"), urls, "base")
    watch_once(out, folder)
    r = watch_once(out, folder)
    assert r["indexed"] == ["s0.parquet"]

    # ---- .docupdate: single-doc upsert (DocUpdateIndexer.java:78) ----
    target = urls[3]
    new_html = "<html><body><p>updated docupdate payload</p></body></html>"
    with open(os.path.join(folder, "one.docupdate"), "w") as f:
        json.dump({"url": target, "html_b64":
                   base64.b64encode(new_html.encode()).decode(),
                   "lang": "en", "warc_ts": "2032-01-01T00:00:00+00:00"}, f)
    dirty = {part_for(target, NUM_PARTS)}
    pre = _clean_part_hashes(out, dirty)
    watch_once(out, folder)  # stability tick
    r2 = watch_once(out, folder)
    assert r2["updated_docs"] == [target]
    assert _clean_part_hashes(out, dirty) == pre  # clean parts untouched
    # content actually replaced (dedup-keep-latest: newer warc_ts wins)
    part = part_for(target, NUM_PARTS)
    t = pq.read_table(os.path.join(out, "docs", f"part={part:05d}", "data.parquet"))
    row = t.filter(pa.compute.equal(t.column("url"), target))
    assert row.num_rows == 1
    assert "updated docupdate payload" in row.column("text")[0].as_py()
    r3 = watch_once(out, folder)  # exactly once
    assert r3["updated_docs"] == []

    # ---- .purge: delete with NO tombstone-ledger trace rows ----
    tomb = os.path.join(out, "tombstones.jsonl")
    pre_lines = open(tomb).read().count("\n") if os.path.exists(tomb) else 0
    victim = urls[5]
    with open(os.path.join(folder, "gone.purge"), "w") as f:
        f.write(victim + "\n")
    watch_once(out, folder)
    r4 = watch_once(out, folder)
    assert r4["purged_urls"] == 1 and r4["deleted_urls"] == 0
    assert victim not in _docs_urls(out)
    post_lines = open(tomb).read().count("\n") if os.path.exists(tomb) else 0
    assert post_lines == pre_lines  # purge leaves NO DATEDELETED rows
    assert watch_once(out, folder)["purged_urls"] == 0  # exactly once

    # .delete on another victim DOES add a trace row (contrast)
    victim2 = urls[6]
    with open(os.path.join(folder, "gone2.delete"), "w") as f:
        f.write(victim2 + "\n")
    watch_once(out, folder)
    r5 = watch_once(out, folder)
    assert r5["deleted_urls"] == 1
    lines = [json.loads(x) for x in open(tomb) if x.strip()]
    assert any(e.get("url") == victim2 for e in lines)
    assert not any(e.get("url") == victim for e in lines)

    # ---- .UPDATED: exactly-once acknowledgement, nothing rewritten ----
    pre_all = _clean_part_hashes(out, set())
    with open(os.path.join(folder, "anchor.UPDATED"), "w") as f:
        f.write("superupdate\n")
    watch_once(out, folder)
    r6 = watch_once(out, folder)
    assert r6["acknowledged"] == ["anchor.UPDATED"]
    assert _clean_part_hashes(out, set()) == pre_all
    assert watch_once(out, folder)["acknowledged"] == []


def test_watch_config_hot_reload(ray_session, tmp_path_factory):
    """Round-4 verdict #4 (Configuration.java reload-timer analog):
    the config is re-read between polls; a changed rule re-indexes
    ONLY the files matching its applies_to glob, exactly once; the
    unaffected shard's partitions stay byte-identical."""
    from goobi_viewer_indexer_ray.pipelines.watch import watch_once

    folder = str(tmp_path_factory.mktemp("hot9"))
    out = str(tmp_path_factory.mktemp("watch9") / "out")
    os.makedirs(out, exist_ok=True)
    cfgp = os.path.join(str(tmp_path_factory.mktemp("cfg9")), "watch.json")

    def write_cfg(rules, auto_optimize=False):
        with open(cfgp, "w") as f:
            json.dump({"rules": rules, "auto_optimize": auto_optimize,
                       "interval_s": 0.0}, f)

    write_cfg([{"name": "a", "applies_to": "shard-a*", "opt": 1},
               {"name": "b", "applies_to": "shard-b*", "opt": 1}])
    ua = [f"https://cfg.example/a{i}" for i in range(5)]
    ub = [f"https://cfg.example/b{i}" for i in range(5)]
    _write_shard(os.path.join(folder, "shard-a.parquet"), ua, "a")
    _write_shard(os.path.join(folder, "shard-b.parquet"), ub, "b")
    watch_once(out, folder, config_path=cfgp)
    r = watch_once(out, folder, config_path=cfgp)
    assert sorted(r["indexed"]) == ["shard-a.parquet", "shard-b.parquet"]

    # unchanged config → no reindex
    r2 = watch_once(out, folder, config_path=cfgp)
    assert r2["config_reindexed"] == []

    # change rule a only → shard-a reindexed, shard-b byte-untouched
    all_parts = _clean_part_hashes(out, set())
    write_cfg([{"name": "a", "applies_to": "shard-a*", "opt": 2},
               {"name": "b", "applies_to": "shard-b*", "opt": 1}])
    r3 = watch_once(out, folder, config_path=cfgp)
    assert r3["config_reindexed"] == ["shard-a.parquet"]
    assert _clean_part_hashes(out, set()) == all_parts  # same content →
    # dedup-keep-latest resolves identically; nothing byte-changes
    # exactly once: hash baseline adopted after the reindex committed
    r4 = watch_once(out, folder, config_path=cfgp)
    assert r4["config_reindexed"] == []

    # removing rule b re-indexes only shard-b
    write_cfg([{"name": "a", "applies_to": "shard-a*", "opt": 2}])
    r5 = watch_once(out, folder, config_path=cfgp)
    assert r5["config_reindexed"] == ["shard-b.parquet"]


def test_watch_notify_callback(ray_session, tmp_path_factory):
    """Viewer success-callback analog (Utils.submitDataToViewer,
    Hotfolder.java:737): fires once per mutating tick with the report
    and the remaining-hotfolder-files count; never on a no-op tick;
    notify failures never break the tick."""
    from goobi_viewer_indexer_ray.pipelines.watch import watch_once

    folder = str(tmp_path_factory.mktemp("hot10"))
    out = str(tmp_path_factory.mktemp("watch10") / "out")
    os.makedirs(out, exist_ok=True)
    calls = []
    notify = lambda rep, remaining: calls.append((rep, remaining))  # noqa: E731
    _write_shard(os.path.join(folder, "s0.parquet"),
                 ["https://n.example/0", "https://n.example/1"], "n")
    watch_once(out, folder, notify=notify)
    assert calls == []  # stability tick: nothing happened yet
    watch_once(out, folder, notify=notify)
    assert len(calls) == 1
    rep, remaining = calls[0]
    assert rep["indexed"] == ["s0.parquet"] and remaining == 0
    watch_once(out, folder, notify=notify)
    assert len(calls) == 1  # no-op tick → no call

    def boom(rep, remaining):
        raise RuntimeError("viewer down")

    with open(os.path.join(folder, "gone.delete"), "w") as f:
        f.write("https://n.example/0\n")
    watch_once(out, folder, notify=boom)
    r = watch_once(out, folder, notify=boom)  # must not raise
    assert r["deleted_urls"] == 1


def test_watch_config_malformed_is_skipped(ray_session, tmp_path_factory):
    """A half-written config file must neither crash the tick nor read
    as 'all rules removed' (which would storm-reindex everything)."""
    from goobi_viewer_indexer_ray.pipelines.watch import watch_once

    folder = str(tmp_path_factory.mktemp("hot11"))
    out = str(tmp_path_factory.mktemp("watch11") / "out")
    os.makedirs(out, exist_ok=True)
    cfgp = os.path.join(str(tmp_path_factory.mktemp("cfg11")), "watch.json")
    with open(cfgp, "w") as f:
        json.dump({"rules": [{"name": "a", "applies_to": "*", "opt": 1}]}, f)
    _write_shard(os.path.join(folder, "s0.parquet"),
                 ["https://m.example/0"], "m")
    watch_once(out, folder, config_path=cfgp)
    watch_once(out, folder, config_path=cfgp)  # indexed under rule a
    with open(cfgp, "w") as f:
        f.write('{"rules": [{"na')  # torn write
    r = watch_once(out, folder, config_path=cfgp)  # must not raise
    assert r["config_reindexed"] == []
    with open(cfgp, "w") as f:  # config restored unchanged → still quiet
        json.dump({"rules": [{"name": "a", "applies_to": "*", "opt": 1}]}, f)
    assert watch_once(out, folder, config_path=cfgp)["config_reindexed"] == []


def test_docupdate_malformed_consumed_once(ray_session, tmp_path_factory):
    """Review finding: a malformed .docupdate must not crash-loop the
    daemon — it is consumed exactly once and surfaced in
    report['errors'] (the reference deletes bad files and continues)."""
    from goobi_viewer_indexer_ray.pipelines.watch import watch_once

    folder = str(tmp_path_factory.mktemp("hot12"))
    out = str(tmp_path_factory.mktemp("watch12") / "out")
    os.makedirs(out, exist_ok=True)
    _write_shard(os.path.join(folder, "s0.parquet"), ["https://e.example/0"], "e")
    watch_once(out, folder)
    watch_once(out, folder)  # bootstrap
    with open(os.path.join(folder, "bad.docupdate"), "w") as f:
        f.write('{"no_url_key": true')  # torn AND missing url
    watch_once(out, folder)
    r = watch_once(out, folder)  # must not raise
    assert r["updated_docs"] == []
    assert len(r["errors"]) == 1 and "bad.docupdate" in r["errors"][0]
    r2 = watch_once(out, folder)  # consumed exactly once — no retry loop
    assert r2["errors"] == []


def test_config_change_defers_on_unstable_target(ray_session, tmp_path_factory):
    """Review finding: a config change must not push a still-uploading
    (unstable) target through apply_updates; the whole change defers
    until the target stabilizes, then fires exactly once."""
    from goobi_viewer_indexer_ray.pipelines.watch import watch_once

    folder = str(tmp_path_factory.mktemp("hot13"))
    out = str(tmp_path_factory.mktemp("watch13") / "out")
    os.makedirs(out, exist_ok=True)
    cfgp = os.path.join(str(tmp_path_factory.mktemp("cfg13")), "w.json")

    def write_cfg(opt):
        with open(cfgp, "w") as f:
            json.dump({"rules": [{"name": "a", "applies_to": "*", "opt": opt}]}, f)

    write_cfg(1)
    urls = [f"https://cfgu.example/{i}" for i in range(4)]
    _write_shard(os.path.join(folder, "s0.parquet"), urls, "v1")
    watch_once(out, folder, config_path=cfgp)
    watch_once(out, folder, config_path=cfgp)  # indexed
    # shard starts re-uploading AND the rule changes in the same tick
    _write_shard(os.path.join(folder, "s0.parquet"), urls, "v2")
    write_cfg(2)
    r = watch_once(out, folder, config_path=cfgp)
    assert r["config_reindexed"] == []  # deferred, not half-applied
    r2 = watch_once(out, folder, config_path=cfgp)  # now stable
    # the shard re-enters through one lane exactly once
    assert (r2["config_reindexed"] == ["s0.parquet"]) ^ (
        r2["indexed"] == ["s0.parquet"])
    r3 = watch_once(out, folder, config_path=cfgp)
    assert r3["config_reindexed"] == [] and r3["indexed"] == []


def test_config_modified_glob_covers_old_scope(ray_session, tmp_path_factory):
    """Review finding: when a rule's applies_to glob CHANGES, files
    matching only the OLD glob leave the rule's governance and must be
    re-forced too (union of old+new scopes)."""
    from goobi_viewer_indexer_ray.pipelines.watch import watch_once

    folder = str(tmp_path_factory.mktemp("hot14"))
    out = str(tmp_path_factory.mktemp("watch14") / "out")
    os.makedirs(out, exist_ok=True)
    cfgp = os.path.join(str(tmp_path_factory.mktemp("cfg14")), "w.json")

    def write_cfg(glob_):
        with open(cfgp, "w") as f:
            json.dump({"rules": [{"name": "a", "applies_to": glob_}]}, f)

    write_cfg("shard-a*")
    _write_shard(os.path.join(folder, "shard-a.parquet"),
                 ["https://g.example/a"], "a")
    _write_shard(os.path.join(folder, "shard-b.parquet"),
                 ["https://g.example/b"], "b")
    watch_once(out, folder, config_path=cfgp)
    watch_once(out, folder, config_path=cfgp)
    write_cfg("shard-b*")  # rule moves scope a → b
    r = watch_once(out, folder, config_path=cfgp)
    assert sorted(r["config_reindexed"]) == ["shard-a.parquet", "shard-b.parquet"]


def test_docupdate_infra_error_retries(ray_session, tmp_path_factory, monkeypatch):
    """Review finding: an APPLY-phase failure (infra, not a bad file)
    must leave the command unconsumed so the next tick retries —
    only parse errors consume the file."""
    from goobi_viewer_indexer_ray.pipelines import watch as watch_mod

    folder = str(tmp_path_factory.mktemp("hot15"))
    out = str(tmp_path_factory.mktemp("watch15") / "out")
    os.makedirs(out, exist_ok=True)
    url = "https://retry.example/0"
    _write_shard(os.path.join(folder, "s0.parquet"), [url], "r")
    watch_mod.watch_once(out, folder)
    watch_mod.watch_once(out, folder)  # bootstrap
    with open(os.path.join(folder, "up.docupdate"), "w") as f:
        json.dump({"url": url, "html": "<p>retried payload zq</p>"}, f)
    watch_mod.watch_once(out, folder)  # stability tick

    calls = {"n": 0}
    real = watch_mod.update_doc

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("transient ENOSPC")
        return real(*a, **kw)

    monkeypatch.setattr(watch_mod, "update_doc", flaky)
    import pytest as _pytest
    with _pytest.raises(OSError):
        watch_mod.watch_once(out, folder)  # infra failure propagates
    r = watch_mod.watch_once(out, folder)  # retried and applied
    assert r["updated_docs"] == [url]
    assert watch_mod.watch_once(out, folder)["updated_docs"] == []
