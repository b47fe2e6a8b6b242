"""Remote shard storage with a local LRU cache.

Equivalent of the reference's Azure BlobStorage layer
(datasets/blob_storage.py:49-186): TSV/zip shards living in remote object
storage are fetched on first touch by an external copier subprocess
(azcopy / gsutil / curl, whichever matches the URL), kept in a bounded
local cache with LRU eviction, with bounded retry and a per-process rename
dance so concurrent ranks don't clobber each other's downloads.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import time
from collections import OrderedDict
from typing import Optional


def _copier_cmd(url: str, dst: str) -> list[str]:
    if url.startswith(("gs://",)):
        return ["gsutil", "-q", "cp", url, dst]
    if url.startswith(("http://", "https://")) and "blob.core.windows.net" in url:
        return ["azcopy", "copy", url, dst]
    if url.startswith(("http://", "https://")):
        return ["curl", "-fsSL", "-o", dst, url]
    raise ValueError(f"no copier for url {url!r}")


class RemoteShardCache:
    def __init__(self, cache_dir: str, max_files: int = 8,
                 retries: int = 3, rank: int = 0):
        self.cache_dir = os.path.abspath(cache_dir)
        os.makedirs(self.cache_dir, exist_ok=True)
        self.max_files = max_files
        self.retries = retries
        self.rank = rank
        self._lru: "OrderedDict[str, str]" = OrderedDict()

    def _local_path(self, url: str) -> str:
        return os.path.join(self.cache_dir, os.path.basename(url))

    def fetch(self, url: str) -> str:
        """Return a local path for the shard, downloading if needed."""
        path = self._local_path(url)
        if path in self._lru:
            self._lru.move_to_end(path)
            return path
        if not os.path.isfile(path):
            self._download(url, path)
        self._lru[path] = url
        self._evict()
        return path

    def _download(self, url: str, path: str) -> None:
        # rank-suffixed temp + rename (blob_storage.py:156-164): concurrent
        # ranks each download to their own file; first rename wins.
        tmp = f"{path}.rank{self.rank}.tmp"
        err: Optional[Exception] = None
        for attempt in range(self.retries):
            try:
                subprocess.run(_copier_cmd(url, tmp), check=True,
                               capture_output=True)
                if not os.path.isfile(path):
                    os.replace(tmp, path)
                else:
                    os.unlink(tmp)
                return
            except (subprocess.CalledProcessError, FileNotFoundError, OSError) as e:
                err = e
                time.sleep(min(2 ** attempt, 10))
        raise RuntimeError(f"failed to fetch {url} after {self.retries} "
                           f"attempts") from err

    def _evict(self) -> None:
        while len(self._lru) > self.max_files:
            path, _ = self._lru.popitem(last=False)
            try:
                os.unlink(path)
            except OSError:
                pass


class RemoteCompositeTSV:
    """CompositeTSVDataset over remote shard URLs: shards are fetched
    lazily through the cache; pair with chunk_aware_indices so each
    process touches few shards per epoch."""

    def __init__(self, urls: list[str], cache: RemoteShardCache,
                 chunk_sizes: Optional[list[int]] = None):
        from esvit_tpu.data.datasets import TSVDataset

        self.urls = urls
        self.cache = cache
        self._open: dict[int, TSVDataset] = {}
        # chunk sizes must be known up front for global indexing; callers
        # pass them from a manifest (the reference stores them alongside
        # the shard list, tsv_file.py:167-257).
        if chunk_sizes is None:
            raise ValueError("chunk_sizes manifest required for remote TSVs")
        self.chunk_sizes = chunk_sizes
        self.cum = [0]
        for n in chunk_sizes:
            self.cum.append(self.cum[-1] + n)

    def __len__(self):
        return self.cum[-1]

    def _shard(self, s: int):
        from esvit_tpu.data.datasets import TSVDataset

        if s not in self._open:
            path = self.cache.fetch(self.urls[s])
            self._open[s] = TSVDataset(path)
        return self._open[s]

    def __getitem__(self, i: int):
        import bisect

        s = bisect.bisect_right(self.cum, i) - 1
        return self._shard(s)[i - self.cum[s]]
