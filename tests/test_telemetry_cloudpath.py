"""Telemetry payload and cloudpath URL plumbing tests."""

import json
import threading

import pytest


def test_telemetry_payload_fields():
    """Field parity with telemetry.rs:8-33 (+ device)."""
    from sage_tpu.pipeline.input import build_search
    from sage_tpu.pipeline.telemetry import Telemetry

    cfg = {
        "database": {"fasta": "/root/reference/tests/Q99536.fasta"},
        "precursor_tol": {"ppm": [-50, 50]},
        "fragment_tol": {"ppm": [-10, 10]},
        "mzml_paths": ["/root/reference/tests/LQSRPAAPPAPGPGQLTLR.mzML"],
    }
    search = build_search(cfg, output_directory="/tmp")
    t = Telemetry(search, peptides=102, fragments=1000, parquet=True,
                  runtime_secs=7)
    p = t.payload
    for key in ("version", "peptides", "fragments", "files", "runtime_secs",
                "lfq", "tmt", "parquet", "os_name", "total_memory", "cpus",
                "device"):
        assert key in p, key
    assert p["peptides"] == 102 and p["files"] == 1
    json.dumps(p)  # serializable


def test_telemetry_send_local_endpoint():
    """send() POSTs the payload (local HTTP server) and never raises."""
    import http.server

    from sage_tpu.pipeline.input import build_search
    from sage_tpu.pipeline.telemetry import Telemetry

    received = {}
    done = threading.Event()

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.update(json.loads(self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()
            done.set()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cfg = {
            "database": {"fasta": "/root/reference/tests/Q99536.fasta"},
            "precursor_tol": {"ppm": [-50, 50]},
            "fragment_tol": {"ppm": [-10, 10]},
            "mzml_paths": ["x.mzML"],
        }
        search = build_search(cfg, output_directory="/tmp")
        t = Telemetry(search, 1, 2, False, 3)
        t.send(url=f"http://127.0.0.1:{srv.server_port}/")
        assert done.wait(5.0)
        assert received["peptides"] == 1 and received["fragments"] == 2
    finally:
        srv.shutdown()


def test_cloudpath_urls(tmp_path):
    from sage_tpu.io.cloudpath import (
        file_format, filename, is_gzip, read_bytes, to_url, try_parse_url,
    )

    assert try_parse_url("s3://bucket/key.mzML") == ("s3", "s3://bucket/key.mzML")
    assert try_parse_url("C:\\data\\x.mzML") is None  # drive letter != scheme
    assert try_parse_url("/plain/path") is None
    p = tmp_path / "x.txt"
    p.write_text("hello")
    scheme, loc = to_url(str(p))
    assert scheme == "file" and loc.endswith("x.txt")
    with pytest.raises(FileNotFoundError):
        to_url(str(tmp_path / "missing"))
    assert is_gzip("a.mzML.gz") and is_gzip("b.gzip") and not is_gzip("c.mzML")
    # gzip transparency
    import gzip as _gz

    gz = tmp_path / "y.txt.gz"
    gz.write_bytes(_gz.compress(b"payload"))
    assert read_bytes(str(gz)) == b"payload"
    assert filename("s3://b/run.d/analysis.tdf") == "run.d"
    assert filename("/a/b/sample.mzML") == "sample.mzML"
    assert file_format("x.MzML.GZ") == "mzml"
    assert file_format("x.mgf") == "mgf"
    assert file_format("weird.xyz") == "unidentified"


def test_cloud_scheme_gating():
    """Cloud schemes without a usable SDK raise informative errors (never
    silently fall through to the local-file path)."""
    from sage_tpu.io.cloudpath import read_bytes

    with pytest.raises(RuntimeError, match="boto3"):
        read_bytes("s3://bucket/key")
    # google-cloud-storage IS installed in this image; without
    # credentials/egress the read still fails loudly
    with pytest.raises(Exception):
        read_bytes("gs://bucket/key")


# ---------------------------------------------------------------------------
# Fake-SDK cloud reads: execute the gated s3/gs/az code paths end-to-end
# (recorded-bytes fakes injected as the SDK modules), including gzip
# transparency — parity with object_store's scheme handling
# (sage-cloudpath/src/lib.rs:65-89).
# ---------------------------------------------------------------------------

import gzip
import sys
import types


def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def test_s3_read_with_fake_boto3(monkeypatch):
    from sage_tpu.io.cloudpath import read_bytes

    calls = {}

    class FakeS3:
        def get_object(self, Bucket, Key):
            calls["bucket"], calls["key"] = Bucket, Key
            body = types.SimpleNamespace(read=lambda: b"s3-bytes")
            return {"Body": body}

    monkeypatch.setitem(
        sys.modules, "boto3", _module("boto3", client=lambda kind: FakeS3())
    )
    assert read_bytes("s3://my-bucket/data/run.mzML") == b"s3-bytes"
    assert calls == {"bucket": "my-bucket", "key": "data/run.mzML"}


def test_gs_read_with_fake_sdk(monkeypatch):
    from sage_tpu.io.cloudpath import read_bytes

    calls = {}

    class FakeBlob:
        def __init__(self, name):
            calls["key"] = name

        def download_as_bytes(self):
            return gzip.compress(b"gs-payload")

    class FakeBucket:
        def __init__(self, name):
            calls["bucket"] = name

        def blob(self, name):
            return FakeBlob(name)

    class FakeClient:
        def bucket(self, name):
            return FakeBucket(name)

    storage = _module("google.cloud.storage", Client=FakeClient)
    cloud = _module("google.cloud", storage=storage)
    monkeypatch.setitem(sys.modules, "google.cloud", cloud)
    monkeypatch.setitem(sys.modules, "google.cloud.storage", storage)
    # gzip transparency applies to cloud reads too
    assert read_bytes("gs://gbucket/x/y.mzML.gz") == b"gs-payload"
    assert calls == {"bucket": "gbucket", "key": "x/y.mzML.gz"}


def _fake_azure(monkeypatch, calls):
    class FakeDownload:
        def readall(self):
            return b"az-bytes"

    class FakeBlobClient:
        def download_blob(self):
            return FakeDownload()

    class FakeService:
        def __init__(self, account_url=None, credential=None):
            calls["account_url"] = account_url

        @classmethod
        def from_connection_string(cls, conn):
            calls["conn"] = conn
            return cls()

        def get_blob_client(self, container, blob):
            calls["container"], calls["blob"] = container, blob
            return FakeBlobClient()

    blob_mod = _module("azure.storage.blob", BlobServiceClient=FakeService)
    storage_mod = _module("azure.storage", blob=blob_mod)
    azure_mod = _module("azure", storage=storage_mod)
    monkeypatch.setitem(sys.modules, "azure", azure_mod)
    monkeypatch.setitem(sys.modules, "azure.storage", storage_mod)
    monkeypatch.setitem(sys.modules, "azure.storage.blob", blob_mod)


def test_az_read_account_from_env(monkeypatch):
    from sage_tpu.io.cloudpath import read_bytes

    calls = {}
    _fake_azure(monkeypatch, calls)
    monkeypatch.delenv("AZURE_STORAGE_CONNECTION_STRING", raising=False)
    monkeypatch.setenv("AZURE_STORAGE_ACCOUNT", "myacct")
    monkeypatch.setenv("AZURE_STORAGE_ACCESS_KEY", "sekrit")
    assert read_bytes("az://cont/path/to/run.mzML") == b"az-bytes"
    assert calls["account_url"] == "https://myacct.blob.core.windows.net"
    assert calls["container"] == "cont"
    assert calls["blob"] == "path/to/run.mzML"


def test_az_read_abfss_url_and_connection_string(monkeypatch):
    from sage_tpu.io.cloudpath import _parse_azure_url, read_bytes

    assert _parse_azure_url(
        "abfss", "abfss://cont@acct.dfs.core.windows.net/a/b.mzML"
    ) == ("cont", "acct", "a/b.mzML")

    calls = {}
    _fake_azure(monkeypatch, calls)
    monkeypatch.setenv("AZURE_STORAGE_CONNECTION_STRING", "UseDev=1")
    assert read_bytes("abfss://c2@acct.dfs.core.windows.net/k.mzML") == b"az-bytes"
    assert calls["conn"] == "UseDev=1"
    assert calls["container"] == "c2" and calls["blob"] == "k.mzML"


def test_az_read_missing_account_raises(monkeypatch):
    from sage_tpu.io.cloudpath import read_bytes

    calls = {}
    _fake_azure(monkeypatch, calls)
    monkeypatch.delenv("AZURE_STORAGE_CONNECTION_STRING", raising=False)
    monkeypatch.delenv("AZURE_STORAGE_ACCOUNT", raising=False)
    with pytest.raises(RuntimeError, match="AZURE_STORAGE_ACCOUNT"):
        read_bytes("az://cont/key")
