"""Streaming asset download (the reference's download_file equivalent,
demo_bottrack_onnx_tflite.py:1815-1838).

The reference pulls ONNX models + prebuilt TensorRT engines from its
GitHub releases at startup. Our weights are orbax checkpoint directories
(typically distributed as .tar archives); this helper fetches and
unpacks them with the same create-folder / status-check behavior. Gated
on the `requests` package (environments without egress get a clear
error instead of a crash).
"""

from __future__ import annotations

import os
import tarfile

from botsort_tpu.utils.colors import green, red


def download_file(url: str, folder: str, filename: str,
                  chunk_size: int = 1 << 16) -> str | None:
    """Download url -> folder/filename; returns the path or None."""
    try:
        import requests
    except ImportError:
        print(red("ERROR: the `requests` package is unavailable; fetch "
                  f"{url} manually into {folder}/"))
        return None
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, filename)
    print(green("Downloading...") + f" {url} -> {path}")
    resp = requests.get(url, stream=True, timeout=60)
    if resp.status_code != 200:
        print(red(f"Failed to download ({resp.status_code}): {url}"))
        return None
    with open(path, "wb") as f:
        for chunk in resp.iter_content(chunk_size=chunk_size):
            f.write(chunk)
    print(green("Download completed: ") + path)
    return path


def fetch_checkpoint(url: str, weights_dir: str, stem: str) -> bool:
    """Fetch {stem}.tar and unpack to weights_dir/stem/ (idempotent)."""
    target = os.path.join(weights_dir, stem)
    if os.path.isdir(target):
        return True
    tar_path = download_file(url, weights_dir, f"{stem}.tar")
    if tar_path is None:
        return False
    with tarfile.open(tar_path) as tf:
        tf.extractall(weights_dir, filter="data")
    os.remove(tar_path)
    return os.path.isdir(target)
