"""Snapshot table: atomic commits, lineage, time travel, kill/resume."""

import json

import pytest
from pyspark.sql import functions as F

from receipt_scanner_spark.sources.pages import write_corpus
from receipt_scanner_spark.table.snapshots import (
    SnapshotTable,
    run_resumable_extraction,
)


@pytest.fixture()
def pages(spark, tmp_path):
    write_corpus(str(tmp_path / "c"), n_rows=300, seed=42, n_files=4)
    return spark.read.parquet(str(tmp_path / "c" / "pages.parquet"))


class TestSnapshotTable:
    def test_commit_and_read(self, spark, pages, tmp_path):
        table = SnapshotTable(str(tmp_path / "t"))
        df = pages.select("url", "lang")
        snap = table.commit(df, ["all"], metrics={"total": 300})
        assert snap.snapshot_id == 1 and snap.parent_id is None
        assert table.read(spark).count() == 300
        assert table.snapshot().metrics == {"total": 300}

    def test_duplicate_partition_rejected(self, spark, pages, tmp_path):
        table = SnapshotTable(str(tmp_path / "t"))
        df = pages.select("url").limit(10)
        table.commit(df, ["p1"])
        with pytest.raises(ValueError, match="already committed"):
            table.commit(df, ["p1"])

    def test_overwrite_shadows(self, spark, pages, tmp_path):
        table = SnapshotTable(str(tmp_path / "t"))
        table.commit(pages.select("url").limit(10), ["p1"])
        table.commit(pages.select("url").limit(5), ["p2"])
        table.commit(pages.select("url").limit(3), ["p1"], overwrite=True)
        assert table.read(spark).count() == 8  # 3 (new p1) + 5 (p2)
        # time travel: at snapshot 2 the old p1 is still visible
        assert table.read(spark, as_of=2).count() == 15

    def test_schema_evolution_explicit(self, spark, pages, tmp_path):
        """Iceberg-style evolution: silent schema drift is rejected;
        column ADDS need the explicit flag; reads merge old and new
        files with nulls; drops are refused outright."""
        table = SnapshotTable(str(tmp_path / "t"))
        table.commit(pages.select("url", "lang").limit(10), ["p1"])
        evolved = pages.select(
            "url", "lang", F.lit(1).alias("crawl_round")
        ).limit(5)
        # silent drift rejected
        with pytest.raises(ValueError, match="allow_schema_change"):
            table.commit(evolved, ["p2"])
        # explicit add allowed
        table.commit(evolved, ["p2"], allow_schema_change=True)
        out = table.read(spark)
        assert set(out.columns) == {"url", "lang", "crawl_round"}
        assert out.filter("crawl_round IS NULL").count() == 10  # old files
        assert out.filter("crawl_round = 1").count() == 5
        # time travel before the evolution: old schema only
        assert set(table.read(spark, as_of=1).columns) == {"url", "lang"}
        # dropping a column is refused even with the flag
        with pytest.raises(ValueError, match="ADDS only"):
            table.commit(
                pages.select("url").limit(3), ["p3"], allow_schema_change=True
            )

    def test_compaction_rewrites_small_files(self, spark, pages, tmp_path):
        """rewrite_data_files analog: many small commits -> one
        compaction overwrite; contents identical, fewer live files,
        time travel to pre-compaction intact, partitions still
        processed (resume unaffected)."""
        table = SnapshotTable(str(tmp_path / "t"))
        # 3 small commits (each repartitioned to 2 files)
        for i, p in enumerate(["p1", "p2", "p3"]):
            table.commit(
                pages.select("url", "lang").limit(30 + i).repartition(2), [p]
            )
        n_live_before = len(table._live_files())
        assert n_live_before >= 6
        rows_before = sorted(r["url"] for r in table.read(spark).collect())
        pre_compaction_head = table.current_snapshot_id()

        snap = table.compact(spark, target_files=1)
        assert snap.operation == "overwrite"
        assert len(table._live_files()) < n_live_before
        assert sorted(r["url"] for r in table.read(spark).collect()) == rows_before
        # time travel to the pre-compaction snapshot still works
        assert (
            sorted(r["url"] for r in table.read(spark, as_of=pre_compaction_head).collect())
            == rows_before
        )
        # resume: nothing pending
        assert table.pending_partitions(["p1", "p2", "p3"]) == []

    def test_expire_snapshots_after_compaction(self, spark, pages, tmp_path):
        """expire_snapshots + orphan cleanup: only valid at a compaction
        point; old manifests and unreachable commit dirs are deleted,
        contents and resume semantics survive, expired time travel
        raises cleanly."""
        table = SnapshotTable(str(tmp_path / "t"))
        for p in ["p1", "p2"]:
            table.commit(pages.select("url", "lang").limit(20), [p])
        # not a compaction point yet -> refused
        with pytest.raises(ValueError, match="compact"):
            table.expire_snapshots(keep_from=2)
        snap = table.compact(spark)
        rows = sorted(r["url"] for r in table.read(spark).collect())
        # default grace protects the fresh (but unreferenced) commit dirs
        graced = table.expire_snapshots(keep_from=snap.snapshot_id)
        assert graced["orphan_files_deleted"] == 0
        assert len(list((tmp_path / "t" / "data").iterdir())) == 3
        # history is already squashed; a second call at the (now-root)
        # snapshot expires nothing but still runs the orphan sweep,
        # which deletes the unreferenced dirs once the grace is waived
        report = table.expire_snapshots(
            keep_from=snap.snapshot_id, orphan_grace_s=0.0
        )
        assert graced["expired"] == 2 and report["orphan_files_deleted"] >= 2
        # contents identical, resume still complete
        assert sorted(r["url"] for r in table.read(spark).collect()) == rows
        assert table.pending_partitions(["p1", "p2"]) == []
        # only the retained commit dir remains on disk
        assert len(list((tmp_path / "t" / "data").iterdir())) == 1
        # expired time travel raises cleanly
        with pytest.raises(ValueError, match="empty table"):
            table.read(spark, as_of=1)
        # further commits proceed normally on the squashed chain
        table.commit(pages.select("url", "lang").limit(5), ["p3"])
        assert table.read(spark).count() == len(rows) + 5

    def test_atomic_manifest_no_tmp_leak(self, spark, pages, tmp_path):
        table = SnapshotTable(str(tmp_path / "t"))
        table.commit(pages.select("url").limit(10), ["p1"])
        leftovers = list((tmp_path / "t" / "_manifests").glob("*.tmp"))
        assert not leftovers


class TestResumableExtraction:
    def test_full_run_then_noop(self, spark, pages, tmp_path):
        table = SnapshotTable(str(tmp_path / "t"))
        snaps = run_resumable_extraction(spark, pages, table)
        assert {p for s in snaps for p in s.partitions} == {"en", "es"}
        assert table.read(spark).count() == 300
        # second run: everything already committed → no-op
        again = run_resumable_extraction(spark, pages, table)
        assert again == []
        assert table.read(spark).count() == 300

    def test_kill_mid_run_resumes(self, spark, pages, tmp_path):
        table = SnapshotTable(str(tmp_path / "t"))
        # simulate a job killed after the first partition committed
        first_part = table.pending_partitions(["en", "es"])[0]
        sub = pages.filter(F.col("lang") == first_part)
        from receipt_scanner_spark.plans.pipeline import extract_pages

        table.commit(extract_pages(sub, observe=False), [first_part],
                     metrics={"total": sub.count()})
        # resume: processes ONLY the remaining partition
        snaps = run_resumable_extraction(spark, pages, table)
        assert [p for s in snaps for p in s.partitions] == ["es"] or [
            p for s in snaps for p in s.partitions
        ] == ["en"]
        assert table.read(spark).count() == 300
        # lineage + per-partition metrics recorded (north rule)
        hist = table.metrics_history()
        assert len(hist) == 2
        assert all("total" in h["metrics"] for h in hist[1:])

    def test_resumed_equals_single_shot(self, spark, pages, tmp_path):
        t1 = SnapshotTable(str(tmp_path / "t1"))
        run_resumable_extraction(spark, pages, t1)
        t2 = SnapshotTable(str(tmp_path / "t2"))
        # kill/restart path
        from receipt_scanner_spark.plans.pipeline import extract_pages

        sub = pages.filter(F.col("lang") == "en")
        t2.commit(extract_pages(sub, observe=False), ["en"], metrics={})
        run_resumable_extraction(spark, pages, t2)

        a = t1.read(spark).select("url", "extracted_text", "amount", "date", "error")
        b = t2.read(spark).select("url", "extracted_text", "amount", "date", "error")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_extraction_udf_runs_once_per_row(self, spark, pages, tmp_path):
        """Metrics ride the commit write via df.observe — the extraction
        UDF must materialize exactly ONCE per row (the earlier shape ran
        the plan twice: once for metrics, once for the write)."""
        calls = spark.sparkContext.accumulator(0)

        def counting_parser(text, config=None):
            calls.add(1)
            return {"match": None, "matches": []}

        table = SnapshotTable(str(tmp_path / "t"))
        snaps = run_resumable_extraction(
            spark, pages, table, parsers=["amount", "date", counting_parser]
        )
        n_rows = pages.count()
        out = table.read(spark)
        assert out.count() == n_rows
        # parsers only run on rows whose extraction produced text
        n_parsed = out.filter("extracted_text IS NOT NULL").count()
        assert n_parsed > 0.8 * n_rows
        assert calls.value == n_parsed  # once per parsed row, not 2x
        # observe-based metrics still recorded per commit
        assert sum(s.metrics["total"] for s in snaps) == n_rows
        assert all(
            set(s.metrics) == {"total", "amount", "date", "errors"} for s in snaps
        )

    def test_manifest_is_json_with_lineage(self, spark, pages, tmp_path):
        table = SnapshotTable(str(tmp_path / "t"))
        run_resumable_extraction(spark, pages, table)
        manifest = json.loads(
            next((tmp_path / "t" / "_manifests").glob("snap-*.json")).read_text()
        )
        assert {"snapshot_id", "parent_id", "partitions", "files", "metrics"} <= set(
            manifest
        )
