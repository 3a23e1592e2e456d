"""Model-zip download helper (reference utils/download.py:7-17).

Fetches and extracts released score/confidence model archives into a local
cache.  Gated: this build environment has no network egress, so the download
degrades to a clear error telling the user to place the archive manually.
"""
from __future__ import annotations

import logging
import os
import urllib.request
import zipfile

logger = logging.getLogger(__name__)

DEFAULT_CACHE = os.path.expanduser("~/.cache/diffdock_pocket_tpu/model")


def download_and_extract(url: str, tag: str, cache_dir: str = DEFAULT_CACHE) -> str:
    """Return the extracted model dir for ``tag``, downloading if needed."""
    out_dir = os.path.join(cache_dir, tag)
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    zip_path = os.path.join(out_dir, "model.zip")
    try:
        logger.info("downloading %s", url)
        urllib.request.urlretrieve(url, zip_path)
    except Exception as e:
        raise RuntimeError(
            f"could not download {url} ({e}); this environment may have no "
            f"network egress — place the extracted model files in {out_dir} "
            "manually"
        ) from e
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(out_dir)
    os.remove(zip_path)
    return out_dir
