"""Index rotation + lagged read/write selection.

The reference rotates nightly-rebuilt indices via ZooKeeper metadata
(ElasticsearchIndexRotationManagerZookeeper.java:105-179: register the
rebuilt index name/alias + rebuild pipeline state; readers swap when the
node cache updates) and picks read/write targets with a lag rule
(RealtimeIndexSelectionStrategyLagged.java:41-146: within LAG days of
index birth use the live index, else the rebuilt alias). ZooKeeper is an
infrastructure choice, not a capability — here the registry is a small
parquet table of immutable version rows + an atomic alias pointer
(write-temp + os.replace, the same atomicity contract as a ZK znode
update), and the lag rule is a pure function over timestamps.

All timestamps are explicit arguments (no wall-clock reads inside logic —
deterministic, mirrors the reference's forced-UTC discipline,
driver/Driver.java:22-23).
"""
from __future__ import annotations

import json
import re
import os
import uuid
from dataclasses import asdict, dataclass
from datetime import date, datetime, timedelta, timezone

DEFAULT_LAG_DAYS = 2  # RealtimeIndexSelectionStrategyLagged.java:39


@dataclass(frozen=True)
class IndexVersion:
    """ElasticSearchIndexMetadata.java:22-65 analog."""
    alias: str
    root: str                 # index directory (storage.py layout)
    index_date: str           # ISO date the data covers ("birth date")
    registered_at: str        # ISO timestamp of registration
    num_shards: int
    build_id: str
    state: str = "COMPLETE"   # RebuildPipelineState.java:3-6: RUNNING|COMPLETE


class RotationRegistry:
    """Versioned registry under <base>/registry: one JSON file per
    version (immutable), plus <alias>.current containing the active
    version id — swapped atomically via os.replace (POSIX rename)."""

    def __init__(self, base: str):
        self.base = os.path.join(base, "registry")
        os.makedirs(self.base, exist_ok=True)

    def _vpath(self, vid: str) -> str:
        return os.path.join(self.base, f"version-{vid}.json")

    def _apath(self, alias: str) -> str:
        return os.path.join(self.base, f"{alias}.current")

    _ID_RE = re.compile(r"^version-(\d{8})-[0-9a-f]{12}\.json$")

    def _next_seq(self) -> int:
        # Only filenames matching the CURRENT id shape (8-digit
        # zero-padded seq, dash, 12-hex uuid) count toward the sequence.
        # A legacy pre-sequence file like version-123456789012.json (a
        # 12-hex id that happens to be all digits) must NOT be parsed as
        # seq=123456789012 — that would jump the sequence forever.
        seqs = [int(m.group(1)) for fn in os.listdir(self.base)
                if (m := self._ID_RE.match(fn))]
        return (max(seqs) + 1) if seqs else 0

    def register(self, v: IndexVersion) -> str:
        """Register a rebuilt index version (the ZK registerIndexAvailableOnRotation
        analog). Returns the version id; does NOT move the alias. Version
        ids carry a monotone sequence prefix so listing order ==
        registration order (deterministic history)."""
        vid = f"{self._next_seq():08d}-{uuid.uuid4().hex[:12]}"
        with open(self._vpath(vid), "w") as f:
            json.dump({"vid": vid, **asdict(v)}, f)
        return vid

    def mark_state(self, vid: str, state: str) -> None:
        """Advance a version's rebuild pipeline state
        (RebuildPipelineState.java:3-6: RUNNING → COMPLETE)."""
        p = self._vpath(vid)
        if not os.path.exists(p):
            raise ValueError(f"unknown version {vid}")
        with open(p) as f:
            v = json.load(f)
        v["state"] = state
        # '.'-prefixed tmp name so a crash mid-write can never leave a
        # file that versions()/_next_seq would pick up.
        tmp = os.path.join(os.path.dirname(p), "." + os.path.basename(p) + ".tmp")
        with open(tmp, "w") as f:
            json.dump(v, f)
        os.replace(tmp, p)

    def swap(self, alias: str, vid: str) -> None:
        """Atomically point the alias at a registered version. Refuses
        versions whose rebuild pipeline hasn't reached COMPLETE — the
        reader-side state check the reference does before honoring a
        rotation (ElasticsearchIndexRotationManagerZookeeper.java:149-179
        + RebuildPipelineState.java:3-6)."""
        if not os.path.exists(self._vpath(vid)):
            raise ValueError(f"unknown version {vid}")
        with open(self._vpath(vid)) as f:
            v = json.load(f)
        # Legacy rows (written before state tracking existed) were only
        # ever created for finished builds — treat a missing 'state' as
        # COMPLETE so rollback to an old version keeps working.
        if v.get("state", "COMPLETE") != "COMPLETE":
            raise ValueError(
                f"version {vid} state={v.get('state')!r}: only COMPLETE "
                "versions can serve an alias")
        tmp = self._apath(alias) + f".tmp.{os.getpid()}.{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            f.write(vid)
        os.replace(tmp, self._apath(alias))

    def current(self, alias: str) -> dict | None:
        try:
            with open(self._apath(alias)) as f:
                vid = f.read().strip()
            with open(self._vpath(vid)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def watch(self, alias: str) -> "AliasWatch":
        """Open a node-cache-style watch on an alias (see AliasWatch)."""
        return AliasWatch(self, alias)

    def versions(self, alias: str | None = None) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.base)):
            if fn.startswith("version-") and fn.endswith(".json"):
                with open(os.path.join(self.base, fn)) as f:
                    v = json.load(f)
                if alias is None or v["alias"] == alias:
                    out.append(v)
        return out


class AliasWatch:
    """Node-cache analog (ElasticsearchIndexRotationManagerZookeeper
    .java:120-139: readers keep a ZK NodeCache on the alias znode and
    observe swaps without re-reading ZK on every request). Here the
    "znode" is the ``<alias>.current`` file; because ``swap`` replaces
    it via os.replace, a change ALWAYS changes the inode, so one
    os.stat per probe — (st_ino, st_mtime_ns, st_size) — is a
    sufficient change token. ``poll()`` is the listener callback site:
    it returns the new version row exactly once per observed swap and
    None otherwise, re-reading the registry only when the token moved.
    No background threads: the caller (or ServingIndex, per query)
    drives the probe, keeping behavior deterministic and testable."""

    def __init__(self, registry: "RotationRegistry", alias: str):
        self.registry = registry
        self.alias = alias
        self._token = self._stat()
        self._value = registry.current(alias)

    def _stat(self):
        try:
            st = os.stat(self.registry._apath(self.alias))
            return (st.st_ino, st.st_mtime_ns, st.st_size)
        except FileNotFoundError:
            return None

    def changed(self) -> bool:
        """One stat; True iff the alias pointer moved since the last
        poll()/construction."""
        return self._stat() != self._token

    def poll(self) -> dict | None:
        """Return the NEW current-version row if the alias moved since
        the last poll (advancing the cached token), else None. Like the
        ZK node cache, a deleted pointer keeps the last value cached
        (``value()``) but poll reports nothing new."""
        tok = self._stat()
        if tok == self._token:
            return None
        self._token = tok
        cur = self.registry.current(self.alias)
        if cur is not None:
            self._value = cur
        return cur

    def value(self) -> dict | None:
        """Last observed current-version row (cached; no I/O)."""
        return self._value


def lagged_selection(index_date: date, today: date,
                     lag_days: int = DEFAULT_LAG_DAYS) -> str:
    """RealtimeIndexSelectionStrategyLagged.java:41-59 analog: data
    younger than the lag hasn't been through a nightly rebuild yet →
    serve it from the 'live' (realtime) side; older data from the
    rebuilt index."""
    return "live" if index_date > today - timedelta(days=lag_days) \
        else "rebuilt"


def select_root(registry: RotationRegistry, alias: str,
                query_date: date, today: date,
                live_root: str | None = None,
                lag_days: int = DEFAULT_LAG_DAYS) -> str:
    """Resolve which index root serves a query about ``query_date``."""
    if lagged_selection(query_date, today, lag_days) == "live":
        if live_root is None:
            raise ValueError("live index required for recent data")
        return live_root
    cur = registry.current(alias)
    if cur is None:
        raise ValueError(f"no rebuilt version for alias {alias}")
    return cur["root"]


def utcnow_iso() -> str:
    return datetime.now(timezone.utc).isoformat()
