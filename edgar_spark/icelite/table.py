"""Versioned Parquet snapshots with an atomic JSON manifest.

Layout::

    <root>/_manifest.json              # {"current": 3, "snapshots": {...}}
    <root>/snap-000001/<table>/*.parquet
    <root>/snap-000002/<table>/*.parquet

A snapshot commit writes all table directories first, then atomically
replaces the manifest (``os.replace`` — POSIX-atomic on the same filesystem),
so readers either see the previous snapshot or the complete new one: the same
reader guarantee an Iceberg snapshot commit provides. Rollback = pointing
``current`` at an older id; old snapshots are retained for time travel.

Named refs (Iceberg's branches/tags): the manifest additionally carries
``refs`` — ``{"name": {"type": "tag"|"branch", "snapshot": id}}``. A TAG
is an immutable pointer (re-tagging raises; drop + recreate to move); a
BRANCH is mutable and advances when ``commit_snapshot(branch=...)``
publishes to it, leaving ``current`` (the main line) untouched.
``expire_snapshots`` keeps every ref-pointed snapshot alive. Snapshot ids
are allocated as max(existing)+1, never current+1 — so a commit after a
rollback (or on a branch) creates a NEW snapshot instead of silently
overwriting a retained one.
"""

from __future__ import annotations

import json
import os
import pathlib
from typing import Dict, Optional


class IceliteCatalog:
    def __init__(self, root: str) -> None:
        self.root = pathlib.Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    @property
    def _manifest_path(self) -> pathlib.Path:
        return self.root / "_manifest.json"

    def _read_manifest(self) -> dict:
        if not self._manifest_path.exists():
            return {"current": 0, "snapshots": {}}
        return json.loads(self._manifest_path.read_text())

    def _publish(self, m: dict) -> None:
        tmp = self._manifest_path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(m, indent=2))
        os.replace(tmp, self._manifest_path)  # atomic publish

    def current_snapshot_id(self) -> int:
        return self._read_manifest()["current"]

    # ---------------------------------------------- named refs (tags/branches)
    def refs(self) -> dict:
        return dict(self._read_manifest().get("refs", {}))

    def resolve_ref(self, name: str) -> int:
        r = self._read_manifest().get("refs", {})
        if name not in r:
            raise KeyError(f"unknown ref {name!r}")
        return r[name]["snapshot"]

    def _set_ref(self, name: str, kind: str, snap_id: Optional[int]) -> int:
        m = self._read_manifest()
        sid = snap_id or m["current"]
        if str(sid) not in m["snapshots"]:
            raise KeyError(f"unknown snapshot {sid}")
        existing = m.setdefault("refs", {}).get(name)
        if existing is not None and (existing["type"] == "tag" or kind == "tag"):
            raise ValueError(
                f"ref {name!r} already exists as a {existing['type']} — "
                "tags are immutable (drop_ref + recreate to move)"
            )
        m["refs"][name] = {"type": kind, "snapshot": sid}
        self._publish(m)
        return sid

    def tag(self, name: str, snap_id: Optional[int] = None) -> int:
        """Immutable named pointer to a snapshot (default: current) —
        Iceberg's tag: 'the corpus we trained run X on'."""
        return self._set_ref(name, "tag", snap_id)

    def branch(self, name: str, snap_id: Optional[int] = None) -> int:
        """Mutable named pointer (default: current); advance it by
        committing with ``commit_snapshot(branch=name)``."""
        return self._set_ref(name, "branch", snap_id)

    def drop_ref(self, name: str) -> None:
        m = self._read_manifest()
        if name not in m.get("refs", {}):
            raise KeyError(f"unknown ref {name!r}")
        del m["refs"][name]
        self._publish(m)

    @staticmethod
    def _sid(m: dict, snap_id: Optional[int], ref: Optional[str]) -> int:
        if ref is not None:
            refs = m.get("refs", {})
            if ref not in refs:
                raise KeyError(f"unknown ref {ref!r}")
            return refs[ref]["snapshot"]
        return snap_id or m["current"]

    def snapshot_meta(
        self, snap_id: Optional[int] = None, ref: Optional[str] = None
    ) -> dict:
        m = self._read_manifest()
        sid = self._sid(m, snap_id, ref)
        if sid == 0:
            return {}
        return m["snapshots"][str(sid)].get("meta", {})

    def table_path(
        self,
        name: str,
        snap_id: Optional[int] = None,
        ref: Optional[str] = None,
    ) -> Optional[str]:
        """Data path of ``name`` in the given snapshot / named ref
        (default: current), or None if absent."""
        m = self._read_manifest()
        sid = self._sid(m, snap_id, ref)
        if sid == 0:
            return None
        return m["snapshots"][str(sid)]["tables"].get(name)

    def commit_snapshot(
        self,
        dfs: Dict[str, "object"],
        meta: Optional[dict] = None,
        carry: Optional[Dict[str, str]] = None,
        branch: Optional[str] = None,
    ) -> int:
        """Write every table of the snapshot, then atomically publish it.

        Table writes run as concurrent Spark jobs (one thread each — the
        scheduler interleaves their stages across cores), so a two-table
        commit costs ~max, not sum, of the write times. Atomicity is
        unaffected: the manifest is published only after every write
        returns.

        ``carry`` maps table names to already-written data paths (from a
        previous snapshot) to include unchanged — the Iceberg
        shared-manifest pattern: a snapshot references files, it does not
        copy them.

        ``branch`` publishes to that named branch ref instead of the main
        line: the branch pointer advances, ``current`` is untouched.
        Snapshot ids are max+1, so branch and main commits interleave
        without collision (and a post-rollback commit never overwrites a
        retained snapshot)."""
        m = self._read_manifest()
        if branch is not None:
            refs = m.get("refs", {})
            if branch not in refs or refs[branch]["type"] != "branch":
                raise KeyError(f"unknown branch {branch!r}")
        sid = max([0] + [int(i) for i in m["snapshots"]]) + 1
        snap_dir = self.root / f"snap-{sid:06d}"
        tables = dict(carry or {})
        if len(dfs) > 1:
            from concurrent.futures import ThreadPoolExecutor

            def _write(item):
                name, df = item
                df.write.mode("overwrite").parquet(str(snap_dir / name))

            with ThreadPoolExecutor(max_workers=len(dfs)) as pool:
                list(pool.map(_write, dfs.items()))  # propagate exceptions
            tables.update({name: str(snap_dir / name) for name in dfs})
        else:
            for name, df in dfs.items():
                path = snap_dir / name
                df.write.mode("overwrite").parquet(str(path))
                tables[name] = str(path)
        m["snapshots"][str(sid)] = {"tables": tables, "meta": meta or {}}
        if branch is not None:
            m["refs"][branch]["snapshot"] = sid
        else:
            m["current"] = sid
        self._publish(m)
        return sid

    def read(
        self,
        spark,
        name: str,
        snap_id: Optional[int] = None,
        ref: Optional[str] = None,
    ):
        m = self._read_manifest()
        sid = self._sid(m, snap_id, ref)
        if sid == 0:
            raise FileNotFoundError(f"no snapshot in {self.root}")
        snap = m["snapshots"][str(sid)]
        if name not in snap["tables"]:
            raise KeyError(f"table {name} not in snapshot {sid}")
        return spark.read.parquet(snap["tables"][name])

    def tables(self, snap_id: Optional[int] = None) -> list:
        m = self._read_manifest()
        sid = snap_id or m["current"]
        if sid == 0:
            return []
        return sorted(m["snapshots"][str(sid)]["tables"])

    def expire_snapshots(self, keep_last: int = 5) -> list:
        """Iceberg ``expireSnapshots`` analog: retire every snapshot except
        the ``keep_last`` most recent (the current snapshot is always
        retained), then delete the data directories no longer referenced by
        ANY retained snapshot. Shared-manifest aware: a carried-forward
        table path referenced by a survivor is kept even though the
        snapshot that wrote it is expired — a snapshot references files, it
        does not own them. Without expiry a one-commit-per-wave crawl grows
        storage without bound; with it, steady-state disk is
        O(keep_last × table size). Returns the expired snapshot ids.
        """
        import shutil

        m = self._read_manifest()
        ids = sorted(int(s) for s in m["snapshots"])
        keep = set(ids[-max(1, keep_last):])
        keep.add(m["current"])
        # every ref-pointed snapshot stays alive — dropping a tagged
        # corpus out from under its name would break the ref contract
        keep.update(r["snapshot"] for r in m.get("refs", {}).values())
        expired = [i for i in ids if i not in keep]
        if not expired:
            return []
        live_paths = {
            p
            for i in keep
            for p in m["snapshots"][str(i)]["tables"].values()
        }
        dead_paths = {
            p
            for i in expired
            for p in m["snapshots"][str(i)]["tables"].values()
        } - live_paths
        for i in expired:
            del m["snapshots"][str(i)]
        self._publish(m)  # readers never see a gap
        for p in dead_paths:  # physical delete only after the publish
            pp = pathlib.Path(p)
            if pp.exists() and self.root in pp.parents:
                shutil.rmtree(pp, ignore_errors=True)
                parent = pp.parent
                if parent != self.root and not any(parent.iterdir()):
                    parent.rmdir()  # drop the now-empty snap-… dir
        return expired

    def compact_table(
        self,
        spark,
        name: str,
        target_file_bytes: int = 128 << 20,
        meta: Optional[dict] = None,
    ) -> int:
        """Iceberg ``rewriteDataFiles`` analog: rewrite ``name``'s data
        into size-targeted files and publish the result as a NEW snapshot
        (every other table carries forward via the shared manifest). A
        one-commit-per-wave crawl accretes per-wave small files; at scale
        the small-files problem dominates scan planning and open() cost,
        so compaction to ~target_file_bytes keeps scans at full stride.

        Merging uses ``coalesce`` (no shuffle — partitions concatenate);
        a table already at or below the target file count is a NO-OP
        (current snapshot id returned, nothing rewritten — Iceberg's
        rewrite does the same). The pre-compaction snapshot stays
        time-travelable until ``expire_snapshots`` retires it, exactly
        like Iceberg's rewrite: compaction changes files, never rows.
        Returns the snapshot id (new on rewrite, current on no-op).
        """
        # one manifest read supplies path + carry so both come from the
        # SAME snapshot even if another commit lands mid-call
        m = self._read_manifest()
        sid = m["current"]
        if sid == 0:
            raise KeyError(f"table {name} not in current snapshot")
        tables = m["snapshots"][str(sid)]["tables"]
        path = tables.get(name)
        if path is None:
            raise KeyError(f"table {name} not in current snapshot")
        files = [
            f
            for f in pathlib.Path(path).glob("*.parquet")
            if f.is_file()
        ]
        n_bytes = sum(f.stat().st_size for f in files)
        n_target = max(1, -(-n_bytes // target_file_bytes))  # ceil
        if n_target >= len(files):
            return sid  # already compact — no rewrite, no new snapshot
        df = spark.read.parquet(path).coalesce(n_target)
        carry = {t: p for t, p in tables.items() if t != name}
        info = {"compacted": name, "from_files": len(files), "to_files": n_target}
        info.update(meta or {})
        return self.commit_snapshot({name: df}, meta=info, carry=carry)

    def rollback(self, snap_id: int) -> None:
        m = self._read_manifest()
        if str(snap_id) not in m["snapshots"]:
            raise KeyError(f"unknown snapshot {snap_id}")
        m["current"] = snap_id
        self._publish(m)
