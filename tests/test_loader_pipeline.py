"""PrefetchLoader: coverage, shapes, shutdown, and the too-small-dataset
guard."""

import numpy as np
import pytest

from weclip_tpu.data.loader import PrefetchLoader, collate


class ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2, 2), i, np.float32), "idx": np.int32(i)}


def test_loader_covers_epoch_without_dupes():
    ds = ToyDataset(12)
    loader = PrefetchLoader(ds, batch_size=4, seed=0, num_threads=1)
    seen = []
    it = iter(loader)
    for _ in range(3):                    # one epoch = 3 batches
        b = next(it)
        assert b["x"].shape == (4, 2, 2)
        seen.extend(b["idx"].tolist())
    assert sorted(seen) == list(range(12))
    # loader repeats forever
    b = next(it)
    assert b["x"].shape == (4, 2, 2)
    loader.close()


def test_loader_rejects_batch_larger_than_dataset():
    with pytest.raises(ValueError):
        PrefetchLoader(ToyDataset(3), batch_size=8)


def test_collate_strings():
    out = collate([{"name": "a", "v": np.ones(2)},
                   {"name": "b", "v": np.zeros(2)}])
    assert list(out["name"]) == ["a", "b"]
    assert out["v"].shape == (2, 2)
