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
