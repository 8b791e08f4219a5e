import pyarrow as pa
import pytest

from searchengine_ray.sources.storage import VersionedTable


def test_append_versions_timetravel(tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    assert t.latest() is None
    v1 = t.append(pa.table({"x": [1, 2]}))
    v2 = t.append(pa.table({"x": [3]}))
    assert t.versions() == [v1, v2]
    assert t.read(v1)["x"].to_pylist() == [1, 2]
    assert sorted(t.read(v2)["x"].to_pylist()) == [1, 2, 3]
    assert t.read()["x"].to_pylist() == t.read(v2)["x"].to_pylist()
    assert t.count(v1) == 2 and t.count() == 3


def test_reopen_resumes(tmp_path):
    p = str(tmp_path / "tbl")
    t = VersionedTable(p)
    t.append(pa.table({"x": [1]}))
    t2 = VersionedTable(p)  # fresh handle, same directory
    assert t2.latest() == 1
    t2.append(pa.table({"x": [2]}))
    assert t2.count() == 2


def test_to_ray(ray_session, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.append(pa.table({"x": list(range(100))}))
    t.append(pa.table({"x": list(range(100, 150))}))
    ds = t.to_ray()
    assert ds.count() == 150
    assert t.to_ray(1).count() == 100
