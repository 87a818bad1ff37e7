"""Rotation registry + lagged selection (reference A17/A18 analogs,
mirroring IndexRotationStrategyZookeeperTest.java:54-143's scenarios:
register/read round-trip, lagged selection across 0-3 day offsets,
pipeline state)."""
from datetime import date

import pytest

from sparkfts.rotation import (DEFAULT_LAG_DAYS, IndexVersion,
                               RotationRegistry, lagged_selection,
                               select_root)


def _v(alias="conversations", root="/tmp/idxA", d="2026-01-10"):
    return IndexVersion(alias=alias, root=root, index_date=d,
                        registered_at="2026-01-11T01:00:00+00:00",
                        num_shards=8, build_id="b1")


def test_register_swap_roundtrip(tmp_path):
    reg = RotationRegistry(str(tmp_path))
    assert reg.current("conversations") is None
    v1 = reg.register(_v(root="/tmp/idxA"))
    reg.swap("conversations", v1)
    assert reg.current("conversations")["root"] == "/tmp/idxA"
    v2 = reg.register(_v(root="/tmp/idxB"))
    reg.swap("conversations", v2)
    assert reg.current("conversations")["root"] == "/tmp/idxB"
    # history preserved (immutable versions, listed in registration order)
    assert [v["root"] for v in reg.versions("conversations")] \
        == ["/tmp/idxA", "/tmp/idxB"]


def test_swap_unknown_version_rejected(tmp_path):
    reg = RotationRegistry(str(tmp_path))
    with pytest.raises(ValueError):
        reg.swap("conversations", "nope")


def test_lagged_selection_day_offsets():
    """RealtimeIndexSelectionStrategyLagged: dates 0..3 days back with
    LAG=2 → live, live, rebuilt, rebuilt."""
    today = date(2026, 1, 12)
    got = [lagged_selection(date(2026, 1, 12 - off), today)
           for off in range(4)]
    assert got == ["live", "live", "rebuilt", "rebuilt"]
    assert DEFAULT_LAG_DAYS == 2


def test_select_root_routes_by_lag(tmp_path):
    reg = RotationRegistry(str(tmp_path))
    vid = reg.register(_v(root="/idx/rebuilt"))
    reg.swap("conversations", vid)
    today = date(2026, 1, 12)
    assert select_root(reg, "conversations", date(2026, 1, 5), today,
                       live_root="/idx/live") == "/idx/rebuilt"
    assert select_root(reg, "conversations", date(2026, 1, 12), today,
                       live_root="/idx/live") == "/idx/live"
    with pytest.raises(ValueError):
        select_root(reg, "conversations", date(2026, 1, 12), today)
    with pytest.raises(ValueError):
        select_root(reg, "missing-alias", date(2026, 1, 5), today)


def test_pipeline_state_field(tmp_path):
    reg = RotationRegistry(str(tmp_path))
    vid = reg.register(IndexVersion(
        alias="c", root="/r", index_date="2026-01-10",
        registered_at="t", num_shards=4, build_id="b", state="RUNNING"))
    assert reg.versions("c")[0]["state"] == "RUNNING"
    assert vid  # registered but not swappable yet


def test_swap_refuses_running_version(tmp_path):
    """RebuildPipelineState gating: a RUNNING rebuild must not serve an
    alias; marking it COMPLETE unlocks the swap
    (ElasticsearchIndexRotationManagerZookeeper.java:149-179 analog)."""
    reg = RotationRegistry(str(tmp_path))
    vid = reg.register(IndexVersion(
        alias="c", root="/r", index_date="2026-01-10",
        registered_at="t", num_shards=4, build_id="b", state="RUNNING"))
    with pytest.raises(ValueError, match="COMPLETE"):
        reg.swap("c", vid)
    assert reg.current("c") is None
    reg.mark_state(vid, "COMPLETE")
    reg.swap("c", vid)
    assert reg.current("c")["root"] == "/r"


def test_legacy_registry_files_tolerated(tmp_path):
    """ADVICE r02: a pre-sequence registry (version-<12hex>.json rows,
    no 'state' key) must keep working: register() must not crash on the
    legacy filename, swap() must treat missing state as COMPLETE
    (rollback to an old version), and in-flight tmp files must be
    invisible to versions()."""
    import json
    import os
    reg = RotationRegistry(str(tmp_path))
    legacy_vid = "ab12cd34ef56"
    with open(os.path.join(reg.base, f"version-{legacy_vid}.json"),
              "w") as f:
        json.dump({"vid": legacy_vid, "alias": "c", "root": "/idx/old",
                   "index_date": "2026-01-01", "registered_at": "t",
                   "num_shards": 4, "build_id": "b0"}, f)   # no 'state'
    # a crashed writer's stray tmp must be ignored, not json.load'ed
    with open(os.path.join(reg.base, "version-zzz.json.tmp"), "w") as f:
        f.write("{not json")
    assert [v["vid"] for v in reg.versions("c")] == [legacy_vid]
    vid2 = reg.register(_v(alias="c", root="/idx/new"))   # must not raise
    reg.swap("c", vid2)
    assert reg.current("c")["root"] == "/idx/new"
    reg.swap("c", legacy_vid)                             # rollback works
    assert reg.current("c")["root"] == "/idx/old"
