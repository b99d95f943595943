"""Version-control behavioral scenarios, ported from the reference's
README collaborative workflow (reference README.md:262-366) and
tests/integration/version_control/ (test_version_control.py,
test_detect_merge.py conflict matrix)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark import dataset as ds_mod  # noqa: E402
from muller_spark.errors import (  # noqa: E402
    CheckoutError,
    MergeConflictError,
    TensorAlreadyExistsError,
    TensorDoesNotExistError,
)


@pytest.fixture()
def base_ds(spark, tmp_path):
    ds = ds_mod.dataset(str(tmp_path / "ds"), spark)
    ds.create_tensor("labels", htype="generic", dtype="int64")
    ds.create_tensor("categories", htype="text")
    ds.create_tensor("description", htype="text")
    ds.extend({
        "labels": [0, 1, 2, 3],
        "categories": ["cat", "dog", "bird", "cat"],
        "description": ["d0", "d1", "d2", "d3"],
    })
    ds.commit("base 4 rows")
    return ds


def _labels(ds):
    return list(ds.labels.numpy())


def test_crud_roundtrip(spark, tmp_path):
    ds = ds_mod.dataset(str(tmp_path / "crud"), spark)
    ds.create_tensor("x", dtype="int64")
    ds.create_tensor("t", htype="text")
    ds.extend({"x": [1, 2, 3], "t": ["a", "b", "c"]})
    assert len(ds) == 3
    ds.commit("init")

    # update by position
    ds.x[1] = 20
    assert list(ds.x.numpy()) == [1, 20, 3]
    # pop renumbers
    ds.pop(0)
    assert list(ds.x.numpy()) == [20, 3]
    ds.commit("mutated")

    # reopen from disk
    ds2 = ds_mod.load(str(tmp_path / "crud"), spark)
    assert list(ds2.x.numpy()) == [20, 3]
    assert list(ds2.t.numpy()) == ["b", "c"]

    ds2.rename_tensor("x", "y")
    assert list(ds2.y.numpy()) == [20, 3]
    ds2.delete_tensor("t")
    assert "t" not in ds2.tensors
    with pytest.raises(TensorDoesNotExistError):
        ds2.t.numpy()
    with pytest.raises(TensorAlreadyExistsError):
        ds2.create_tensor("y")


def test_append_only_commit_is_incremental(spark, tmp_path):
    ds = ds_mod.dataset(str(tmp_path / "inc"), spark)
    ds.create_tensor("x", dtype="int64")
    ds.extend({"x": [1, 2]})
    ds.commit("c1")
    ds.extend({"x": [3]})
    ds.commit("c2")
    snap = ds.log.resolve("main")
    assert len(snap.data_dirs) == 2, "append should add a delta dir, not rewrite"
    assert list(ds.x.numpy()) == [1, 2, 3]
    # POSIX backend appends commits.jsonl; the unified reader sees
    # init + c1 + c2 in order
    assert [r["message"] for r in ds.log.commit_records()] == [
        "initial commit", "c1", "c2",
    ]


def test_branching_and_checkout(base_ds):
    ds = base_ds
    ds.checkout("dev-1", create=True)
    ds.labels.extend([50, 60])
    ds.categories.extend(["cat", "bird"])
    ds.description.extend(["a cat", "a bird"])
    ds.labels[3] = 30
    ds.pop(1)
    ds.commit("commit on dev-1")
    assert _labels(ds) == [0, 2, 30, 50, 60]

    ds.checkout("main")
    assert _labels(ds) == [0, 1, 2, 3]
    assert sorted(ds.branches) == ["dev-1", "main"]

    with pytest.raises(CheckoutError):
        ds.checkout("dev-1", create=True)  # already exists


def test_uncommitted_changes_block_checkout(base_ds):
    ds = base_ds
    ds.labels.extend([9])
    with pytest.raises(CheckoutError):
        ds.checkout("other", create=True)
    ds.reset()
    assert _labels(ds) == [0, 1, 2, 3]


def test_fast_forward_merge(base_ds):
    ds = base_ds
    ds.checkout("dev-1", create=True)
    ds.labels.extend([50])
    ds.categories.extend(["x"])
    ds.description.extend(["y"])
    ds.commit("dev-1 adds one")
    ds.checkout("main")
    ds.merge("dev-1")
    assert _labels(ds) == [0, 1, 2, 3, 50]


def test_three_way_merge_readme_scenario(base_ds):
    """The full collaborative workflow from reference README.md:300-366."""
    ds = base_ds

    ds.checkout("dev-1", create=True)
    ds.labels.extend([50, 60])
    ds.categories.extend(["cat", "bird"])
    ds.description.extend(["ginger tabby", "black cat"])
    ds.labels[3] = 30
    ds.pop(1)
    ds.commit("commit on dev-1")

    ds.checkout("main")
    ds.checkout("dev-2", create=True)
    ds.labels.extend([500, 600])
    ds.categories.extend(["cat", "dog"])
    ds.description.extend(["orange tabby", "golden retriever"])
    ds.labels[3] = 300
    ds.pop([1, 2])
    ds.commit("commit on dev-2")
    assert _labels(ds) == [0, 300, 500, 600]

    # fast-forward dev-1 into main
    ds.checkout("main")
    ds.merge("dev-1", pop_resolution="theirs")
    assert _labels(ds) == [0, 2, 30, 50, 60]

    # conflicts vs dev-2
    conflict_tensors, records = ds.detect_merge_conflict("dev-2", show_value=True)
    assert "labels" in conflict_tensors
    update_vals = {
        (r["our_value"], r["their_value"])
        for r in records["update_conflicts"]["labels"]
    }
    assert (30, 300) in update_vals
    # u1 was popped on both sides → excluded; u2 only in dev-2's pops
    assert len(records["pop_conflicts"]["theirs_popped"]) == 1
    assert len(records["pop_conflicts"]["ours_popped"]) == 0
    assert records["append_conflicts"] == {"ours_appended": 2, "theirs_appended": 2}

    # resolution-less merge must raise
    with pytest.raises(MergeConflictError):
        ds.merge("dev-2")

    ds.merge(
        "dev-2",
        append_resolution="both",
        pop_resolution="ours",
        update_resolution="theirs",
    )
    assert _labels(ds) == [0, 2, 300, 50, 60, 500, 600]


def test_merge_append_resolution_theirs(base_ds):
    ds = base_ds
    ds.checkout("b1", create=True)
    ds.labels.extend([10])
    ds.categories.extend(["x"])
    ds.description.extend(["x"])
    ds.commit("b1")
    ds.checkout("main")
    ds.checkout("b2", create=True)
    ds.labels.extend([99])
    ds.categories.extend(["z"])
    ds.description.extend(["z"])
    ds.commit("b2")
    ds.checkout("main")
    ds.merge("b1")  # ff
    ds.merge("b2", append_resolution="theirs")
    assert _labels(ds) == [0, 1, 2, 3, 99]


def test_merge_pop_resolution_theirs_restores_and_drops(base_ds):
    ds = base_ds
    ds.checkout("p1", create=True)
    ds.pop(0)  # we pop row 0
    ds.commit("p1 pops 0")
    ds.checkout("main")
    ds.checkout("p2", create=True)
    ds.pop(3)  # they pop row 3
    ds.commit("p2 pops 3")
    ds.checkout("p1")
    ds.merge("p2", pop_resolution="theirs")
    # theirs state adopted: row0 restored, row3 dropped
    assert _labels(ds) == [1, 2, 0]

    ds.checkout("main")


def test_schema_evolution_merge(base_ds):
    ds = base_ds
    ds.checkout("dev-3", create=True)
    ds.create_tensor("features", htype="generic", dtype="float64")
    ds.features[0] = 0.5
    ds.commit("add features")
    ds.checkout("main")
    ds.merge("dev-3")  # fast-forward propagates schema
    assert "features" in ds.tensors
    vals = list(ds.features.numpy())
    assert vals[0] == 0.5


def test_schema_merge_three_way(base_ds):
    ds = base_ds
    ds.checkout("s1", create=True)
    ds.labels[0] = 100
    ds.commit("s1 update")
    ds.checkout("main")
    ds.checkout("s2", create=True)
    ds.create_tensor("score", htype="generic", dtype="float64")
    ds.score[1] = 0.9
    ds.commit("s2 new tensor")
    ds.checkout("s1")
    ds.merge("s2")
    assert "score" in ds.tensors
    assert _labels(ds) == [100, 1, 2, 3]
    scores = list(ds.score.numpy())
    assert scores[1] == 0.9


def test_diff(base_ds):
    ds = base_ds
    ds.checkout("d1", create=True)
    ds.labels.extend([7])
    ds.categories.extend(["x"])
    ds.description.extend(["x"])
    ds.labels[0] = 42
    ds.pop(2)
    ds.commit("d1 changes")
    out = ds.diff("d1", "main")
    d1 = out["d1"]
    assert len(d1["appended"]) == 1
    assert len(d1["popped"]) == 1
    assert "labels" in d1["updated"]
    upd = d1["updated"]["labels"][0]
    assert upd["old_value"] == 0 and upd["new_value"] == 42
    main = out["main"]
    assert main["appended"] == [] and main["popped"] == [] and main["updated"] == {}


def test_log_history(base_ds):
    ds = base_ds
    ds.labels.extend([5])
    ds.categories.extend(["e"])
    ds.description.extend(["e"])
    ds.commit("second")
    history = ds.log_history()
    messages = [s.message for s in history]
    assert messages[0] == "second"
    assert messages[-1] == "initial commit"


# ---------------------------------------------------------------------------
# branch locks / protected commit (reference muller/core/lock/file_lock.py,
# protected_commit at commits.py:143, protect_checkout at commits.py:403)
# ---------------------------------------------------------------------------

def test_branch_lock_excludes_second_writer(base_ds):
    from muller_spark.versioning.locks import BranchLock, BranchLockedError

    with base_ds.lock_branch() as lock:
        other = BranchLock(base_ds.log.log_dir, "main", owner="other-writer")
        with pytest.raises(BranchLockedError, match="locked by"):
            other.acquire()
        assert lock.holder()["owner"] == lock.owner
    # released on exit — a new writer may now acquire
    other.acquire()
    other.release()
    assert other.holder() is None


def test_branch_lock_stale_lease_takeover(base_ds):
    from muller_spark.versioning.locks import BranchLock

    crashed = BranchLock(base_ds.log.log_dir, "main", owner="crashed", ttl=0.05)
    crashed.acquire()  # never released — simulates a dead writer
    import time

    time.sleep(0.1)
    fresh = BranchLock(base_ds.log.log_dir, "main", owner="fresh")
    fresh.acquire()
    assert fresh.holder()["owner"] == "fresh"
    fresh.release()


def test_branch_lock_reentrant_same_owner(base_ds):
    from muller_spark.versioning.locks import BranchLock

    a = BranchLock(base_ds.log.log_dir, "main", owner="w1")
    a.acquire()
    b = BranchLock(base_ds.log.log_dir, "main", owner="w1")
    b.acquire()  # same owner: idempotent re-acquire, no deadlock
    assert b.holder()["owner"] == "w1"
    b.release()


def test_protected_commit_commits_and_releases(base_ds):
    base_ds.extend({"labels": [9], "categories": ["x"], "description": ["d"]})
    cid = base_ds.protected_commit("locked append")
    assert base_ds.log.get_ref("main") == cid
    assert base_ds.lock_branch().holder() is None  # lease released


def test_protected_commit_blocked_by_foreign_lease(base_ds):
    from muller_spark.versioning.locks import BranchLock, BranchLockedError

    foreign = BranchLock(base_ds.log.log_dir, "main", owner="someone-else")
    foreign.acquire()
    base_ds.extend({"labels": [9], "categories": ["x"], "description": ["d"]})
    with pytest.raises(BranchLockedError):
        base_ds.protected_commit("should fail", timeout=0.2)
    foreign.release()
    assert base_ds.protected_commit("now succeeds") == base_ds.log.get_ref("main")


def test_detached_checkout_blocks_commit(base_ds):
    """checkout(commit_id) detaches: reads work, commit()/merge() refuse
    until a new branch is forked — otherwise the commit would re-point
    the snapshot's recorded branch at a stale parent and orphan every
    newer commit on it (round-1 ADVICE data-loss hazard)."""
    ds = base_ds
    c1 = ds.commit_id
    ds.extend({"labels": [9], "categories": ["x"], "description": ["d9"]})
    c2 = ds.commit("second")

    ds.checkout(c1)
    assert ds.branch is None
    assert _labels(ds) == [0, 1, 2, 3]
    ds.extend({"labels": [7], "categories": ["y"], "description": ["d7"]})
    with pytest.raises(CheckoutError, match="detached"):
        ds.commit("should refuse")
    ds.reset()  # detached reset returns to the snapshot itself
    assert ds.commit_id == c1 and _labels(ds) == [0, 1, 2, 3]
    with pytest.raises(CheckoutError, match="detached"):
        ds.merge(c2)

    # fork a branch at the detached commit: commit works, main untouched
    ds.checkout("fork", create=True)
    assert ds.branch == "fork"
    ds.extend({"labels": [8], "categories": ["z"], "description": ["d8"]})
    c3 = ds.commit("on fork")
    assert ds.log.get_ref("fork") == c3
    assert ds.log.get_ref("main") == c2  # newer commit still reachable


def test_stale_ref_blocks_commit(base_ds, spark, tmp_path):
    """Two writers on one branch: after A commits, B's commit (parented
    on the old head) must refuse to advance the ref past A's commit."""
    ds = base_ds
    writer_b = ds_mod.load(ds.path, spark)
    ds.extend({"labels": [5], "categories": ["a"], "description": ["da"]})
    ds.commit("A wins")

    writer_b.extend({"labels": [6], "categories": ["b"], "description": ["db"]})
    with pytest.raises(CheckoutError, match="advanced"):
        writer_b.commit("B stale")
    writer_b.reset()
    writer_b.checkout("main")
    assert _labels(writer_b) == [0, 1, 2, 3, 5]


def test_steal_never_deletes_fresh_lock(base_ds):
    """The round-1 ADVICE race: waiter B judged the lease stale, but by
    the time it acts, A has already stolen it and re-acquired.  B's
    steal must leave A's fresh lock in place (content re-verify), so
    A remains the sole holder."""
    import json as _json

    from muller_spark.versioning.locks import BranchLock

    crashed = BranchLock(base_ds.log.log_dir, "main", owner="crashed", ttl=0.05)
    crashed.acquire()
    stale_record = _json.loads(open(crashed.path).read())

    import time as _time

    _time.sleep(0.1)
    a = BranchLock(base_ds.log.log_dir, "main", owner="A")
    a.acquire()  # steals the stale lease and holds a fresh one

    b = BranchLock(base_ds.log.log_dir, "main", owner="B")
    b._steal_stale(stale_record)  # B acts on its outdated observation
    assert b.holder()["owner"] == "A"  # A's fresh lock survived
    assert not b._try_acquire()
    a.release()


def test_concurrent_stale_takeover_single_winner(base_ds):
    """Eight threads all observe one stale lease and race to take over:
    exactly one may end up holding."""
    import threading

    from muller_spark.versioning.locks import BranchLock, BranchLockedError

    crashed = BranchLock(base_ds.log.log_dir, "main", owner="crashed", ttl=0.05)
    crashed.acquire()
    import time as _time

    _time.sleep(0.1)

    winners: list[str] = []
    lock_guard = threading.Lock()

    def contend(name: str) -> None:
        lk = BranchLock(base_ds.log.log_dir, "main", owner=name, timeout=2.0)
        try:
            lk.acquire()
        except BranchLockedError:
            return
        with lock_guard:
            winners.append(name)
        # hold to the end so later acquirers must time out

    threads = [threading.Thread(target=contend, args=(f"w{i}",)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(winners) == 1, winners
    holder = BranchLock(base_ds.log.log_dir, "main").holder()
    assert holder["owner"] == winners[0]


def test_diff_dataframe_first_and_row_cap(base_ds):
    """The scalable diff surface returns DataFrames (no driver collect);
    the dict convenience refuses to materialize reports beyond its row
    cap instead of streaming them to the driver."""
    from muller_spark.versioning.merge import DiffReportTooLargeError

    ds = base_ds
    ds.checkout("dfdiff", create=True)
    ds.labels.extend([7, 8])
    ds.categories.extend(["x", "y"])
    ds.description.extend(["x", "y"])
    ds.labels[0] = 42
    ds.pop(2)
    ds.commit("changes")

    out = ds.diff("dfdiff", "main", as_dict=False)
    rep = out["dfdiff"]
    kinds = {r["kind"]: r for r in rep.collect()}
    assert rep.count() == 4  # 2 appends + 1 pop + 1 update
    assert set(kinds) == {"appended", "popped", "updated"}
    upd = rep.filter(rep.kind == "updated").collect()[0]
    assert upd["tensor"] == "labels"
    assert upd["old_value"] == "0" and upd["new_value"] == "42"
    # the base side of the diff is empty relative to the LCA
    assert out["main"].count() == 0

    # dict form still works under the cap ...
    d = ds.diff("dfdiff", "main")["dfdiff"]
    assert len(d["appended"]) == 2 and len(d["popped"]) == 1
    # ... and refuses beyond it rather than collecting unboundedly
    with pytest.raises(DiffReportTooLargeError, match="DataFrame"):
        ds.diff("dfdiff", "main", max_rows=2)


def test_detect_conflicts_dataframe_and_cap(base_ds):
    from muller_spark.versioning.merge import DiffReportTooLargeError

    ds = base_ds
    ds.checkout("c1", create=True)
    ds.labels[1] = 111
    ds.commit("ours")
    ds.checkout("main")
    ds.checkout("c2", create=True)
    ds.labels[1] = 222
    ds.commit("theirs")
    ds.checkout("c1")

    rep = ds.detect_merge_conflict("c2", as_dict=False)
    rows = rep.collect()
    assert {r["kind"] for r in rows} == {"update"}
    (u,) = rows
    assert u["tensor"] == "labels"
    assert u["our_value"] == "111" and u["their_value"] == "222"

    with pytest.raises(DiffReportTooLargeError):
        ds.detect_merge_conflict("c2", max_rows=0)


def test_commit_log_against_nonlocal_scheme(spark):
    """The metadata layer (commit log, refs, snapshot manifests) must run
    against a non-POSIX filesystem: register an in-memory scheme and
    exercise init/commit/branch/resolve/log end to end through the fs
    seam (muller_spark/fs.py) — no open()/os.* touches the scheme path."""
    from muller_spark.fs import register_fs
    from muller_spark.versioning.log import CommitLog

    class MemFS:
        files: dict = {}
        dirs: set = set()

        def _norm(self, p):
            return p.rstrip("/")

        def read_text(self, p):
            return self.files[self._norm(p)]

        def write_text(self, p, t):
            self.files[self._norm(p)] = t

        def append_text(self, p, t):
            self.files[self._norm(p)] = self.files.get(self._norm(p), "") + t

        def exists(self, p):
            return self._norm(p) in self.files or self.isdir(p)

        def isdir(self, p):
            return self._norm(p) in self.dirs

        def listdir(self, p):
            p = self._norm(p) + "/"
            names = {f[len(p):].split("/")[0] for f in self.files if f.startswith(p)}
            names |= {d[len(p):].split("/")[0] for d in self.dirs if d.startswith(p)}
            return sorted(names)

        def makedirs(self, p):
            parts = self._norm(p).split("/")
            for i in range(len(parts)):
                self.dirs.add("/".join(parts[: i + 1]))

        def remove(self, p):
            del self.files[self._norm(p)]

        def rename(self, src, dst):
            raise NotImplementedError

        def rmtree(self, p):
            p = self._norm(p)
            for f in [f for f in self.files if f.startswith(p)]:
                del self.files[f]
            self.dirs = {d for d in self.dirs if not d.startswith(p)}

    register_fs("memfs", MemFS)
    log = CommitLog("memfs://bucket/ds1")
    assert not log.exists()
    log.init(schema_json=None, tensor_meta={})
    assert log.exists() and log.branches() == ["main"]

    c1 = log.commit(
        parent_ids=[log.get_ref("main")], branch="main", message="one",
        data_dirs=["data/abc"], schema_json=None, tensor_meta={},
        row_count=10, next_uuid=10,
    )
    log.set_ref("dev", c1.commit_id)
    assert log.branches() == ["dev", "main"]
    assert log.get_ref("main") == c1.commit_id
    assert log.resolve("dev").commit_id == c1.commit_id
    assert [s.message for s in log.log(c1.commit_id)] == ["one", "initial commit"]
    # MemFS has no atomic append, so the audit trail is one object per
    # commit (commits/<id>.json), never an appended jsonl
    assert f"memfs://bucket/ds1/_log/commits/{c1.commit_id}.json" in MemFS.files
    assert not any("commits.jsonl" in k for k in MemFS.files)
    log.delete_ref("dev")
    assert log.branches() == ["main"]


def test_interleaved_committers_lose_no_records(spark):
    """Two committers interleaving against a non-atomic-append backend:
    every commit record survives, because each commit writes its own
    commits/<id>.json object — there is no shared append target to
    race on.  (An appended jsonl under MemFS's read-modify-write
    append_text would drop interleaved lines.)"""
    from muller_spark.fs import register_fs
    from muller_spark.versioning.log import CommitLog

    class MemFS2:
        files: dict = {}
        dirs: set = set()

        def _norm(self, p):
            return p.rstrip("/")

        def read_text(self, p):
            return self.files[self._norm(p)]

        def write_text(self, p, t):
            self.files[self._norm(p)] = t

        def append_text(self, p, t):
            self.files[self._norm(p)] = self.files.get(self._norm(p), "") + t

        def exists(self, p):
            return self._norm(p) in self.files or self.isdir(p)

        def isdir(self, p):
            return self._norm(p) in self.dirs

        def listdir(self, p):
            p = self._norm(p) + "/"
            names = {f[len(p):].split("/")[0] for f in self.files if f.startswith(p)}
            names |= {d[len(p):].split("/")[0] for d in self.dirs if d.startswith(p)}
            return sorted(names)

        def makedirs(self, p):
            parts = self._norm(p).split("/")
            for i in range(len(parts)):
                self.dirs.add("/".join(parts[: i + 1]))

        def remove(self, p):
            del self.files[self._norm(p)]

        def rename(self, src, dst):
            raise NotImplementedError

        def rmtree(self, p):
            p = self._norm(p)
            for f in [f for f in self.files if f.startswith(p)]:
                del self.files[f]
            self.dirs = {d for d in self.dirs if not d.startswith(p)}

    register_fs("memfs2", MemFS2)
    # two independent CommitLog handles on the same root — the
    # "two writers" regime (each caches nothing between calls)
    writer_a = CommitLog("memfs2://bucket/shared")
    writer_b = CommitLog("memfs2://bucket/shared")
    writer_a.init(schema_json=None, tensor_meta={})

    ids = []
    for i, (writer, branch) in enumerate([
        (writer_a, "main"), (writer_b, "dev"),
        (writer_a, "main"), (writer_b, "dev"),
    ]):
        parent = (
            [writer.get_ref(branch)] if branch in writer.branches()
            else [writer.get_ref("main")]
        )
        snap = writer.commit(
            parent_ids=parent, branch=branch, message=f"c{i}",
            data_dirs=[f"data/d{i}"], schema_json=None, tensor_meta={},
            row_count=i, next_uuid=i,
        )
        ids.append(snap.commit_id)

    records = writer_a.commit_records()
    got = [r["commit_id"] for r in records]
    # init + all four interleaved commits, each exactly once
    assert len(got) == len(set(got)) == 5
    for cid in ids:
        assert cid in got
    # and each is its own object on "disk"
    for cid in ids:
        assert f"memfs2://bucket/shared/_log/commits/{cid}.json" in MemFS2.files
    # both branch heads point at their writer's last commit
    assert writer_b.get_ref("main") == ids[2]
    assert writer_b.get_ref("dev") == ids[3]


def test_delta_log_export(base_ds, spark):
    """export_delta_log writes a protocol-conformant _delta_log: one
    version per commit (first-parent), add actions whose paths are real
    parquet files that reconstruct each version's row count, remove
    actions on rewrites, and a metaData/protocol header at version 0."""
    import glob
    import json as _json
    import os as _os

    from muller_spark.versioning.delta_export import export_delta_log

    ds = base_ds
    ds.extend({"labels": [9], "categories": ["x"], "description": ["d"]})
    ds.commit("append one")          # append-only: adds only
    ds.labels[0] = 77
    ds.commit("rewrite")             # copy-on-write: removes + adds

    delta_dir = export_delta_log(ds)
    files = sorted(glob.glob(_os.path.join(delta_dir, "*.json")))
    # initial + base fixture commit + append + rewrite = 4 versions
    assert len(files) == 4
    assert _os.path.basename(files[0]) == "00000000000000000000.json"

    def actions(path):
        return [_json.loads(line) for line in open(path) if line.strip()]

    v0 = actions(files[0])
    assert any("protocol" in a for a in v0)
    live: set = set()
    for f in files:
        for a in actions(f):
            if "add" in a:
                live.add(a["add"]["path"])
                assert _os.path.exists(_os.path.join(ds.path, a["add"]["path"]))
            elif "remove" in a:
                live.discard(a["remove"]["path"])
            elif "metaData" in a:
                assert "fields" in a["metaData"]["schemaString"]
    # the surviving file set IS the current table state
    got = spark.read.parquet(*[
        _os.path.join(ds.path, p) for p in sorted(live)
    ])
    assert got.count() == len(ds)
    assert sorted(r["labels"] for r in got.select("labels").collect()) == \
        sorted(ds.labels.numpy().tolist())
    # the rewrite version must carry remove actions
    last = actions(files[-1])
    assert any("remove" in a for a in last)


def test_delta_export_table_id_stable(base_ds):
    """metaData.id must be a stable digest of the table path, not a
    PYTHONHASHSEED-salted builtin hash (ADVICE r2): re-exports — and
    exports from other processes — must agree on table identity."""
    import glob
    import hashlib
    import json as _json
    import os as _os
    import uuid as _uuid

    from muller_spark.versioning.delta_export import export_delta_log

    ds = base_ds

    def exported_id():
        delta_dir = export_delta_log(ds)
        # the root commit has no schema, so metaData is first emitted at
        # the earliest version with one — scan versions in order
        for f in sorted(glob.glob(_os.path.join(delta_dir, "*.json"))):
            for line in open(f):
                a = _json.loads(line)
                if "metaData" in a:
                    return a["metaData"]["id"]
        raise AssertionError("no metaData action in any version")

    expected = str(_uuid.UUID(hashlib.md5(ds.path.encode("utf-8")).hexdigest()))
    assert exported_id() == expected
    assert exported_id() == expected


def test_load_at_commit_id_time_travel(spark, tmp_path):
    """round-6 item #8: ``load("path@<commit-id>")`` opens a detached
    historical snapshot in one step (reference resolves any commit
    address via api/dataset/core.py:132 + checkout addressing)."""
    path = str(tmp_path / "tt")
    ds = ds_mod.dataset(path, spark)
    ds.create_tensor("x", dtype="int64")
    ds.extend({"x": [1, 2, 3]})
    ds.commit("v1")
    v1 = ds.commit_id
    ds.extend({"x": [4, 5]})
    ds.commit("v2")

    # time-travel read: the v1 snapshot, 3 rows, detached
    old = ds_mod.load(f"{path}@{v1}", spark)
    assert len(old) == 3
    assert old.branch is None  # detached — not on any branch
    assert old.commit_id == v1
    with pytest.raises(Exception):
        old.extend({"x": [99]}); old.commit("must refuse on detached")

    # branch addressing still works through the same path
    cur = ds_mod.load(f"{path}@main", spark)
    assert len(cur) == 5 and cur.branch == "main"

    # unknown address raises, not silently opens HEAD
    with pytest.raises(Exception):
        ds_mod.load(f"{path}@deadbeef00", spark)


def test_detect_conflicts_with_both_created_tensor(spark, tmp_path):
    """Dry-run conflict detection must not crash when a tensor exists
    on both branches but not in the merge base (round-6 review: the
    b_<tensor> column is absent from the 3-way join)."""
    path = str(tmp_path / "bc")
    ds = ds_mod.dataset(path, spark)
    ds.create_tensor("x", dtype="int64")
    ds.extend({"x": [1, 2]})
    ds.commit("base")
    ds.checkout("dev", create=True)
    ds.create_tensor("labels", dtype="int64")
    ds.commit("dev adds labels")
    ds.checkout("main")
    ds.create_tensor("labels", dtype="int64")
    ds.commit("main adds labels too")
    # must return a report, not raise AnalysisException
    report = ds.detect_merge_conflict("dev")
    assert isinstance(report, tuple) or report is not None


def _both_created_ds(spark, tmp_path):
    """3 base rows; both branches create tensor z after the LCA.
    dev: z[0]=100, z[2]=9.  main: z[0]=200 (divergent with dev's 100),
    z[1]=7 (one-sided)."""
    path = str(tmp_path / "bc_vals")
    ds = ds_mod.dataset(path, spark)
    ds.create_tensor("x", dtype="int64")
    ds.extend({"x": [1, 2, 3]})
    ds.commit("base")
    ds.checkout("dev", create=True)
    ds.create_tensor("z", dtype="int64")
    ds.z[0] = 100
    ds.z[2] = 9
    ds.commit("dev writes z")
    ds.checkout("main")
    ds.create_tensor("z", dtype="int64")
    ds.z[0] = 200
    ds.z[1] = 7
    ds.commit("main writes z")
    return ds


def test_merge_both_created_tensor_divergent_values_conflict(spark, tmp_path):
    """Reference parity (operations/merge.py:576 — common tensors are
    target∩original regardless of LCA presence): a tensor created on
    BOTH branches after the LCA with divergent values is a real update
    conflict.  Round-6 builds resolved it silently as ours, dropping
    theirs."""
    ds = _both_created_ds(spark, tmp_path)
    with pytest.raises(MergeConflictError, match="updated"):
        ds.merge("dev")


def test_merge_both_created_tensor_resolution_theirs(spark, tmp_path):
    ds = _both_created_ds(spark, tmp_path)
    ds.merge("dev", update_resolution="theirs")
    z = {r["x"]: r["z"] for r in ds.to_df().select("x", "z").collect()}
    # divergent cell takes theirs; one-sided writes merge from BOTH sides
    assert z == {1: 100, 2: 7, 3: 9}


def test_merge_both_created_tensor_resolution_ours(spark, tmp_path):
    ds = _both_created_ds(spark, tmp_path)
    ds.merge("dev", update_resolution="ours")
    z = {r["x"]: r["z"] for r in ds.to_df().select("x", "z").collect()}
    assert z == {1: 200, 2: 7, 3: 9}


def test_merge_both_created_tensor_one_sided_is_silent(spark, tmp_path):
    """Disjoint cell writes to a both-created tensor are NOT a conflict:
    the union merges with no resolution argument."""
    path = str(tmp_path / "bc_disjoint")
    ds = ds_mod.dataset(path, spark)
    ds.create_tensor("x", dtype="int64")
    ds.extend({"x": [1, 2, 3]})
    ds.commit("base")
    ds.checkout("dev", create=True)
    ds.create_tensor("z", dtype="int64")
    ds.z[2] = 9
    ds.commit("dev writes z[2]")
    ds.checkout("main")
    ds.create_tensor("z", dtype="int64")
    ds.z[1] = 7
    ds.commit("main writes z[1]")
    ds.merge("dev")  # no resolution needed
    z = {r["x"]: r["z"] for r in ds.to_df().select("x", "z").collect()}
    assert z == {1: None, 2: 7, 3: 9}


def test_detect_conflicts_reports_both_created_tensor(spark, tmp_path):
    """The dry-run report must list the both-created tensor as an
    update conflict (reference test_detect_merge.py scenario shape)."""
    ds = _both_created_ds(spark, tmp_path)
    conflict_tensors, records = ds.detect_merge_conflict("dev", show_value=True)
    assert "z" in conflict_tensors
    vals = {
        (r["our_value"], r["their_value"])
        for r in records["update_conflicts"]["z"]
    }
    assert (200, 100) in vals


def test_stream_sink_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-invoking the sink handler with
    an already-committed batch_id must not double-append."""
    from muller_spark.streaming.windows import make_dataset_batch_handler

    ds = ds_mod.dataset(str(tmp_path / "sink"), spark)
    ds.create_tensor("x", dtype="int64")
    ds.commit("schema")
    land = make_dataset_batch_handler(ds)  # the REAL sink handler

    batch = spark.createDataFrame([(1,), (2,)], "x long")
    land(batch, 0)
    assert len(ds) == 2
    land(batch, 0)  # crash-replay of the same micro-batch
    assert len(ds) == 2, "replayed batch was double-appended"
    land(batch, 1)
    assert len(ds) == 4
