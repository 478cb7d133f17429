"""Asset downloader against a local HTTP server (no egress needed)."""

import http.server
import io
import os
import tarfile
import threading

import pytest

requests = pytest.importorskip("requests")

from botsort_tpu.runtime import download  # noqa: E402


@pytest.fixture()
def http_root(tmp_path):
    root = tmp_path / "srv"
    root.mkdir()
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(root), **kw)
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield root, f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    server.server_close()


def test_download_file(http_root, tmp_path):
    root, url = http_root
    (root / "blob.bin").write_bytes(b"x" * 100_000)
    out = download.download_file(f"{url}/blob.bin", str(tmp_path / "dl"),
                                 "blob.bin")
    assert out is not None
    assert os.path.getsize(out) == 100_000


def test_download_404(http_root, tmp_path):
    _, url = http_root
    out = download.download_file(f"{url}/missing.bin",
                                 str(tmp_path / "dl"), "missing.bin")
    assert out is None


def test_fetch_checkpoint_unpacks(http_root, tmp_path):
    root, url = http_root
    # Build model_x.tar containing model_x/weights.txt.
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        payload = b"hello"
        info = tarfile.TarInfo("model_x/weights.txt")
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    (root / "model_x.tar").write_bytes(buf.getvalue())

    weights_dir = str(tmp_path / "weights")
    ok = download.fetch_checkpoint(f"{url}/model_x.tar", weights_dir,
                                   "model_x")
    assert ok
    assert open(os.path.join(weights_dir, "model_x",
                             "weights.txt")).read() == "hello"
    # Idempotent.
    assert download.fetch_checkpoint(f"{url}/model_x.tar", weights_dir,
                                     "model_x")


def test_ensure_checkpoints_fetches_missing(http_root, tmp_path,
                                            monkeypatch):
    from botsort_tpu.runtime import assets

    root, url = http_root
    # Serve a tarred checkpoint dir for one model stem.
    stem = "mot17_sbs_S50_NMx3x256x128_post_feature_only"
    src = tmp_path / "src" / stem
    src.mkdir(parents=True)
    (src / "payload.bin").write_bytes(b"weights")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        tf.add(src, arcname=stem)
    (root / f"{stem}.tar").write_bytes(buf.getvalue())

    weights_dir = tmp_path / "weights"
    weights_dir.mkdir()
    monkeypatch.setenv(assets.WEIGHTS_URL_ENV, url)
    assets.ensure_checkpoints([f"{stem}.onnx"], str(weights_dir))
    assert (weights_dir / stem / "payload.bin").read_bytes() == b"weights"
    # Idempotent: second call is a no-op (404 for other names tolerated).
    assets.ensure_checkpoints([f"{stem}.onnx", "missing_model.onnx"],
                              str(weights_dir))
    assert (weights_dir / stem).is_dir()


def test_ensure_checkpoints_noop_without_env(tmp_path, monkeypatch):
    from botsort_tpu.runtime import assets

    monkeypatch.delenv(assets.WEIGHTS_URL_ENV, raising=False)
    weights_dir = tmp_path / "weights"
    assets.ensure_checkpoints(["some_model.onnx"], str(weights_dir))
    assert not weights_dir.exists()
