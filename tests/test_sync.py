"""End-to-end sync scenario tests (SURVEY §5.2's golden-state matrix):
new file / renamed / content change / duplicate / deleted, against
in-memory project tables and a fake REST transport.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from gather_datawarehouse_sync_spark.sources.rest import PROJECT_SCHEMA
from gather_datawarehouse_sync_spark.sync import (
    apply_file_actions,
    plan_category_sync,
    plan_filesystem_sync,
    sync_report,
)


def _files(spark, rows):
    return spark.createDataFrame(rows, "file string, md5 string, size long, ino long")


def _projects(spark, rows):
    """rows: (id, file, md5) with file=None → project without metadata.file"""
    data = [
        {
            "id": pid,
            "metadata": {
                "iam": "gatherbot",
                "file": None if f is None else {"file": f, "md5": m},
            },
            "archived": False,
        }
        for pid, f, m in rows
    ]
    return spark.createDataFrame(data, PROJECT_SCHEMA)


def _plan(spark, files, projects):
    df = plan_filesystem_sync(_files(spark, files), _projects(spark, projects))
    return {r["ino"] if r["ino"] is not None else f"p{r['project_id']}": r for r in df.collect()}


def test_new_files_insert(spark):
    out = _plan(spark, [("a/x.shp", "m1", 5, 1)], [])
    assert out[1]["action"] == "insert" and out[1]["match"] == "none"


def test_identical_state_keeps(spark):
    out = _plan(
        spark,
        [("a/x.shp", "m1", 5, 1)],
        [(10, "a/x.shp", "m1")],
    )
    assert out[1]["action"] == "keep"
    assert out[1]["match"] == "exactMatch" and out[1]["project_id"] == 10


def test_renamed_file_md5_match_updates(spark):
    # same bytes, new path → md5 tier catches it, path update flows (ref :264)
    out = _plan(
        spark,
        [("a/renamed.shp", "m1", 5, 1)],
        [(10, "a/old.shp", "m1")],
    )
    assert out[1]["action"] == "update" and out[1]["match"] == "md5Match"
    assert out[1]["project_id"] == 10


def test_content_change_exact_match_updates(spark):
    # same path, new bytes → path tier wins, md5 update flows (ref :282 —
    # the reference only *logs* this; we persist, SURVEY §7 deviation)
    out = _plan(
        spark,
        [("a/x.shp", "NEW", 5, 1)],
        [(10, "a/x.shp", "OLD")],
    )
    assert out[1]["action"] == "update" and out[1]["match"] == "exactMatch"


def test_path_tier_beats_md5_tier(spark):
    # one file, two candidate projects: path match must win (ref :544-554)
    out = _plan(
        spark,
        [("a/x.shp", "m1", 5, 1)],
        [(20, "other.shp", "m1"), (10, "a/x.shp", "zz")],
    )
    assert out[1]["match"] == "exactMatch" and out[1]["project_id"] == 10
    # the md5-only project is orphaned; its md5 matches no *alias* → archive
    assert out["p20"]["action"] == "archive"


def test_deleted_file_archives_project(spark):
    out = _plan(spark, [], [(10, "gone.shp", "m1")])
    assert out["p10"]["action"] == "archive" and out["p10"]["project_id"] == 10


def test_duplicate_files_one_main_one_leftover_insert(spark):
    # two identical files, no projects: canonical (min path) inserts as
    # main; the alias is unclaimed → step-8 leftover insert (ref :211-221)
    out = _plan(
        spark,
        [("b/copy.shp", "m1", 5, 2), ("a/orig.shp", "m1", 5, 1)],
        [],
    )
    assert out[1]["action"] == "insert" and out[1]["alias"] is None
    assert out[2]["action"] == "insert" and out[2]["alias"] == 1


def test_orphan_second_chance_claims_alias(spark):
    # project matches no main but shares md5 with the *alias* copy →
    # update against the alias file instead of archive (ref :178-203)
    out = _plan(
        spark,
        [("a/orig.shp", "m1", 5, 1), ("b/copy.shp", "m1", 5, 2)],
        [(10, "a/orig.shp", "m1"), (20, "b/old-copy.shp", "m1")],
    )
    assert out[1]["action"] == "keep" and out[1]["project_id"] == 10
    assert out[2]["action"] == "update" and out[2]["project_id"] == 20
    assert out[2]["match"] == "md5Match"
    # no leftover insert: the alias was claimed
    assert len(out) == 2


def test_one_project_claims_one_file(spark):
    # two mains share nothing; one project md5-matches main 1 only once
    out = _plan(
        spark,
        [("a/x.shp", "m1", 5, 1), ("b/y.shp", "m2", 5, 2)],
        [(10, "zz", "m1")],
    )
    assert out[1]["action"] == "update" and out[1]["project_id"] == 10
    assert out[2]["action"] == "insert" and out[2]["project_id"] is None


def test_sync_report_counts(spark):
    actions = plan_filesystem_sync(
        _files(spark, [("a.shp", "m1", 1, 1), ("b.shp", "m2", 1, 2)]),
        _projects(spark, [(10, "a.shp", "m1"), (30, "dead.shp", "zz")]),
    )
    assert sync_report(actions) == {"keep": 1, "insert": 1, "archive": 1}


def test_projects_without_file_metadata_ignored(spark):
    # P1 (ref :79-81): projects lacking metadata.file never participate
    out = _plan(spark, [("a.shp", "m1", 1, 1)], [(10, None, None)])
    assert out[1]["action"] == "insert"
    assert "p10" not in out  # not archived either — it was never considered


def test_apply_file_actions_requests(spark, tmp_path):
    log = tmp_path / "rpc.jsonl"
    log_path = str(log)
    actions = plan_filesystem_sync(
        _files(spark, [("a/new.shp", "m9", 1, 1), ("b/same.shp", "m2", 1, 2)]),
        _projects(spark, [(10, "b/same.shp", "m2"), (30, "dead.shp", "zz")]),
    )

    def transport_factory():
        def transport(method, path, body):
            with open(log_path, "a") as fh:
                fh.write(json.dumps({"m": method, "p": path, "b": body}) + "\n")

        return transport

    apply_file_actions(actions, transport_factory)
    calls = [json.loads(l) for l in log.read_text().splitlines()]
    by_method = {}
    for c in calls:
        # strip the idempotency key (a query param since r16 — a #fragment
        # never reached the server) to group by the logical endpoint
        by_method.setdefault(
            (c["m"], c["p"].split("?")[0].split("#")[0]), []
        ).append(c)
    # keep rows never produce RPCs; insert carries derived title (ref :364)
    assert len(calls) == 2
    ins = by_method[("POST", "/projects")][0]
    assert ins["b"]["attributes"] == {"title": "new", "isDataset": True}
    assert ins["b"]["metadata"]["file"] == {"file": "a/new.shp", "md5": "m9"}
    assert ("POST", "/projects/30/archive") in by_method


def test_category_sync_three_way(spark):
    files = _files(
        spark,
        [("A/B/x.shp", "m1", 1, 1), ("A/y.shp", "m2", 1, 2), ("C/z.shp", "m3", 1, 3)],
    )
    server = spark.createDataFrame(
        [
            # matched: files/A
            {"id": 1, "type": "files", "name": "files/A", "metadata": {"iam": "gatherbot"}},
            # deprecated: files/OLD
            {"id": 2, "type": "files", "name": "files/OLD", "metadata": {"iam": "gatherbot"}},
            # foreign (iam != gatherbot) must be ignored entirely (ref :403-405)
            {"id": 3, "type": "files", "name": "files/C", "metadata": {"iam": "human"}},
        ],
    )
    plan = plan_category_sync(files, server)
    got = {(r["type"], r["name"]): r["action"] for r in plan.collect()}
    assert got[("files", "files/A")] == "keep"
    # type = lowercased parent path (ref :684)
    assert got[("files/a", "files/A/B")] == "insert"
    assert got[("files", "files/OLD")] == "delete"
    assert got[("files", "files/C")] == "insert"


def test_demoted_main_carries_no_stale_project_columns(spark):
    """A main whose md5Match claim is stolen by a path-exact main must
    insert with a FULLY null project tuple — stale p_file/p_md5 on the
    demoted row would leak the stolen project's identity into the
    auditable action plan (r17 review find).  Scenario: project 10 is
    (a/x.shp, mB); ino=1 sits at that path with drifted content (mA),
    ino=2 carries mB at another path.  The exact tier must keep the
    project on ino=1 (update), and ino=2's md5 claim demotes to an
    insert with no project residue."""
    out = _plan(
        spark,
        [("a/x.shp", "mA", 5, 1), ("b/y.shp", "mB", 5, 2)],
        [(10, "a/x.shp", "mB")],
    )
    assert out[1]["action"] == "update" and out[1]["project_id"] == 10
    demoted = out[2]
    assert demoted["action"] == "insert" and demoted["match"] == "none"
    assert demoted["project_id"] is None
    assert demoted["p_file"] is None and demoted["p_md5"] is None
