"""Host-side data loading: a thread-prefetching DataLoader.

Replaces the reference's torch DataLoader worker processes with a thread-pool
prefetcher (image decode is PIL/cv2 C code releasing the GIL). The loader
yields collated batches; batch items stay numpy — device placement happens at
the network boundary (the wrappers' ``to(device)`` equivalent).
"""
import concurrent.futures as futures

import numpy as np


def default_collate(items):
    """Stack numpy arrays; keep lists of variable-shaped items as lists."""
    if isinstance(items[0], (tuple, list)):
        # dataset items that are (input, target, ...) groups: collate per slot
        return tuple(default_collate(list(x)) for x in zip(*items))
    if isinstance(items[0], dict):
        # torch parity: dicts collate per key — the missing-image ``{}``
        # sentinel therefore survives a batch-of-1 as ``{}`` (the infer
        # stage's NaN-row check relies on this). A MIXED batch (sentinel
        # next to real images) must fail loudly: collating it to ``{}``
        # would silently drop the valid images (run sentinel datasets with
        # batch_size 1, as the infer stage does)
        if any(not isinstance(d, dict) or d.keys() != items[0].keys()
               for d in items[1:]):
            raise TypeError(
                "cannot collate a mixed batch of dict sentinels and arrays"
                " — missing-image sentinels need batch_size 1")
        return {key: default_collate([d[key] for d in items])
                for key in items[0]}
    if isinstance(items[0], np.ndarray):
        shapes = {x.shape for x in items}
        if len(shapes) == 1:
            return np.stack(items)
        return items
    return items


def collate_tuples(batch):
    """Keep tuple batches as (list of image-lists, list of targets)."""
    if len(batch) == 1:
        return [batch[0][0]], [batch[0][1]]
    return ([batch[i][0] for i in range(len(batch))],
            [batch[i][1] for i in range(len(batch))])


class DataLoader:
    """Minimal ordered loader: shuffle, batch, collate, thread prefetch."""

    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=4,
                 drop_last=False, collate_fn=None, pin_memory=False,
                 prefetch=8):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(int(num_workers), 0)
        self.drop_last = drop_last
        self.collate_fn = collate_fn or default_collate
        self.prefetch = prefetch
        del pin_memory  # accepted for API parity; no-op on TPU host

    def _batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            batch = order[start:start + self.batch_size]
            if self.drop_last and len(batch) < self.batch_size:
                return
            yield batch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        batches = list(self._batches())
        if self.num_workers == 0:
            for batch in batches:
                yield self.collate_fn([self.dataset[i] for i in batch])
            return

        with futures.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = []
            batch_iter = iter(batches)
            # keep a bounded window of in-flight items
            def submit_next():
                batch = next(batch_iter, None)
                if batch is None:
                    return False
                pending.append([pool.submit(self.dataset.__getitem__, i)
                                for i in batch])
                return True

            for _ in range(self.prefetch):
                if not submit_next():
                    break
            while pending:
                batch_futures = pending.pop(0)
                items = [f.result() for f in batch_futures]
                submit_next()
                yield self.collate_fn(items)
