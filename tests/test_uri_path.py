"""URIPath tests: pathlib surface, local IO, GDC manifest scheme, click type."""

import numpy as np
import pytest

from wsinsight_tpu.uri_path import URIPath, URIPathType


def test_pathlib_surface(tmp_path):
    p = URIPath(str(tmp_path / "a" / "b.svs"))
    assert p.name == "b.svs"
    assert p.stem == "b"
    assert p.suffix == ".svs"
    assert p.parent.name == "a"
    assert (p.parent / "c.tif").name == "c.tif"
    assert p.with_suffix(".csv").name == "b.csv"
    assert p.with_name("x.h5").name == "x.h5"
    assert p.scheme is None


def test_remote_scheme_parsing():
    p = URIPath("s3://bucket/prefix/slide.svs")
    assert p.scheme == "s3"
    assert p.stem == "slide"
    assert str(p.parent) == "s3://bucket/prefix"
    assert str(p / "x") == "s3://bucket/prefix/slide.svs/x"
    # ordering/hash by canonical URI
    assert p == URIPath("s3://bucket/prefix/slide.svs")
    assert len({p, URIPath("s3://bucket/prefix/slide.svs")}) == 1


def test_gdc_token_validated_eagerly(monkeypatch, tmp_path):
    """A set GDC_TOKEN is HEAD-checked at construction; bad tokens fail fast."""
    import wsinsight_tpu.uri_path as up

    manifest = tmp_path / "manifest.tsv"
    manifest.write_text("id\tfilename\tmd5\tsize\n")

    class _Resp:
        status_code = 403

    calls = []

    def fake_head(url, headers=None, timeout=None):
        calls.append((url, headers))
        return _Resp()

    monkeypatch.setenv("GDC_TOKEN", "bad-token")
    monkeypatch.setattr(up, "_CREDENTIALS_OK", set())

    import requests

    monkeypatch.setattr(requests, "head", fake_head)
    with pytest.raises(RuntimeError, match="rejected"):
        URIPath(f"gdc-manifest://{manifest}")
    assert calls and calls[0][1]["X-Auth-Token"] == "bad-token"

    # Non-auth 4xx (endpoint quirk, e.g. bare /data/ needing a UUID) must NOT
    # kill the run — only 401/403 prove the token itself is bad.
    _Resp.status_code = 400
    URIPath(f"gdc-manifest://{manifest}")

    # Unreachable API proves nothing about the token: warn and continue.
    def down_head(url, headers=None, timeout=None):
        raise ConnectionError("network down")

    monkeypatch.setattr(requests, "head", down_head)
    monkeypatch.setattr(up, "_CREDENTIALS_OK", set())
    URIPath(f"gdc-manifest://{manifest}")

    # Good token: validated once, memoised across joins.
    monkeypatch.setattr(requests, "head", fake_head)
    monkeypatch.setattr(up, "_CREDENTIALS_OK", set())
    _Resp.status_code = 200
    p = URIPath(f"gdc-manifest://{manifest}")
    n_after_first = len(calls)
    _ = p / "some-file.svs"
    assert len(calls) == n_after_first  # no re-check on join


def test_remote_fs_init_errors_surface_eagerly(monkeypatch):
    """A remote fs whose construction raises (bad creds) fails at ctor time."""
    import wsinsight_tpu.uri_path as up

    monkeypatch.setattr(up, "_CREDENTIALS_OK", set())

    import fsspec

    def bad_filesystem(scheme, **opts):
        raise PermissionError("bad key")

    monkeypatch.setattr(fsspec, "filesystem", bad_filesystem)
    with pytest.raises(RuntimeError, match="filesystem init failed"):
        URIPath("s3://bucket/x", storage_options={"key": "nope"})

    # Missing backend package is NOT a credential failure: stays lazy.
    def missing_backend(scheme, **opts):
        raise ImportError("s3fs not installed")

    monkeypatch.setattr(fsspec, "filesystem", missing_backend)
    p = URIPath("s3://bucket/y")
    assert p.scheme == "s3"


def test_local_io_and_iterdir(tmp_path):
    d = URIPath(str(tmp_path))
    (tmp_path / "x.csv").write_text("a")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "y.csv").write_text("b")
    files = sorted(str(p.name) for p in d.iterdir(files_only=True))
    assert files == ["x.csv"]
    rec = sorted(str(p.name) for p in d.iterdir(recursive=True, files_only=True))
    assert rec == ["x.csv", "y.csv"]
    f = d / "new.txt"
    f.write_text("hello")
    assert f.read_text() == "hello"
    assert f.exists() and f.is_file()
    f.unlink()
    assert not f.exists()


def test_gdc_manifest_scheme(tmp_path):
    manifest = tmp_path / "manifest.tsv"
    manifest.write_text(
        "id\tfilename\tmd5\tsize\tstate\n"
        "uuid-1\tslideA.svs\tabc\t10\treleased\n"
        "uuid-2\tslideB.svs\tdef\t20\treleased\n"
    )
    root = URIPath(f"gdc-manifest://{manifest}")
    assert root.scheme == "gdc-manifest"
    assert root.exists() and root.is_dir()
    entries = sorted(p.name for p in root.iterdir())
    assert entries == ["slideA.svs", "slideB.svs"]
    child = root / "slideA.svs"
    assert child.exists() and child.is_file()
    missing = root / "nope.svs"
    assert not missing.exists()


def test_uripath_click_type(tmp_path):
    t = URIPathType(exists=True)
    p = t.convert(str(tmp_path), None, None)
    assert isinstance(p, URIPath)
    import click

    with pytest.raises(click.exceptions.UsageError):
        t.convert(str(tmp_path / "missing"), None, None)
    # Remote outputs are accepted without existence round-trips.
    r = URIPathType(exists=True).convert("s3://bucket/out", None, None)
    assert r.scheme == "s3"


def test_sync_on_close_local_write(tmp_path):
    p = URIPath(str(tmp_path / "deep" / "file.bin"))
    with p.open("wb") as fh:
        fh.write(b"\x01\x02")
    assert (tmp_path / "deep" / "file.bin").read_bytes() == b"\x01\x02"
