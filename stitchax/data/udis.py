"""UDIS-D dataset + prefetching loader.

Rebuild of reference core/datasets.py:329-503 (UDISDataset + fetch_dataloader
'udis' stage). Layout: {data_dir}/{training|testing}/input1/*.jpg paired
with input2/*.jpg by filename. Train mode returns (img1, img2, zero-flow,
valid) — UDIS-D has no GT flow (reference :430); test mode returns
(img1, img2, name).

The loader replaces torch DataLoader workers with a thread-pooled
double-buffered prefetcher producing contiguous numpy batches (PIL decode
releases the GIL, so threads scale like the reference's 12 workers).
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


class UDISDataset:
    def __init__(self, data_dir: str, phase: str = "training",
                 is_test: Optional[bool] = None,
                 size: Optional[Tuple[int, int]] = None,
                 return_depth: bool = False,
                 clip_num_data: Optional[int] = None):
        """return_depth loads {phase}/depth2/<name> as an extra 1-channel
        map (channel-mean of the RGB depth render, reference:
        core/datasets.py:330,353-368,437-448); clip_num_data truncates the
        pair list (reference :371-374)."""
        self.phase = phase
        self.is_test = (phase == "testing") if is_test is None else is_test
        self.size = size  # optional fixed (H, W) resize for batching
        self.return_depth = return_depth
        root = os.path.join(data_dir, phase)
        d1, d2 = os.path.join(root, "input1"), os.path.join(root, "input2")
        dd = os.path.join(root, "depth2")
        if not os.path.isdir(d1):
            raise FileNotFoundError(f"no such dataset split: {d1}")
        if return_depth and not os.path.isdir(dd):
            raise FileNotFoundError(
                f"return_depth=True but no depth2 directory at {dd}")
        names = sorted(os.listdir(d1))
        self.pairs: List[Tuple[str, str, str]] = [
            (os.path.join(d1, n), os.path.join(d2, n), n)
            for n in names
            if os.path.exists(os.path.join(d2, n))
            and (not return_depth or os.path.exists(os.path.join(dd, n)))]
        self.depth_dir = dd
        if clip_num_data is not None:
            self.pairs = self.pairs[:clip_num_data]

    def __len__(self):
        return len(self.pairs)

    def _load(self, path: str) -> np.ndarray:
        from PIL import Image
        img = Image.open(path).convert("RGB")
        if self.size is not None:
            img = img.resize((self.size[1], self.size[0]), Image.BILINEAR)
        return np.asarray(img, np.float32)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        p1, p2, name = self.pairs[idx]
        img1, img2 = self._load(p1), self._load(p2)
        item = {"image1": img1, "image2": img2, "name": name}
        if not self.is_test:
            h, w = img1.shape[:2]
            item["flow"] = np.zeros((h, w, 2), np.float32)   # no GT flow
            item["valid"] = np.ones((h, w), np.float32)
        if self.return_depth and not self.is_test:
            # RGB depth render -> channel mean, (H, W, 1) in [0, 255]
            # (reference: datasets.py:437-448 returns this INSTEAD of the
            # zero flow; the dict API carries both)
            d = self._load(os.path.join(self.depth_dir, name))
            item["depth2"] = d.mean(-1, keepdims=True)
        return item


class PrefetchLoader:
    """Thread-pooled, queue-buffered batch loader."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 num_workers: int = 8, seed: int = 0, drop_last: bool = False,
                 prefetch: int = 2):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self) -> List[List[int]]:
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        batches = [idx[i:i + self.batch_size].tolist()
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        self._epoch += 1
        batches = self._batch_indices()
        q: Queue = Queue(maxsize=self.prefetch)
        pool = ThreadPoolExecutor(self.num_workers)
        stop = threading.Event()

        def produce():
            for b in batches:
                if stop.is_set():
                    break
                items = list(pool.map(self.ds.__getitem__, b))
                q.put(self._collate(items))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            pool.shutdown(wait=False)

    @staticmethod
    def _collate(items: List[Dict]) -> Dict[str, np.ndarray]:
        out = {}
        for k in items[0]:
            vals = [it[k] for it in items]
            if isinstance(vals[0], np.ndarray):
                out[k] = np.stack(vals)
            else:
                out[k] = vals
        return out


def fetch_dataloader(cfg, phase: str = "training") -> PrefetchLoader:
    """Stage dispatch (reference: core/datasets.py:453-503, 'udis' stage)."""
    ds_cfg = cfg.get("udis_dataset", {}) if hasattr(cfg, "get") else {}
    data_dir = ds_cfg.get("data_dir", "./UDIS-D/")
    size = tuple(cfg.get("image_size", [512, 512]))
    ds = UDISDataset(data_dir, phase=phase, size=size,
                     return_depth=bool(ds_cfg.get("return_depth", False)),
                     clip_num_data=ds_cfg.get("clip_num_data"))
    return PrefetchLoader(ds, batch_size=cfg.get("batch_size", 1),
                          shuffle=(phase == "training"),
                          num_workers=8, drop_last=(phase == "training"))
