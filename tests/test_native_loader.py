"""Native C++ prefetching batcher (data/native_loader.py + native/batcher.cpp)."""
import numpy as np
import pytest

from inverseproblemwithdiffusionmodel_tpu.data.native_loader import (
    native_available, NativeBatchIterator, native_batch_iterator)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")


def test_epoch_covers_all_samples_without_repeats():
    data = np.arange(24, dtype=np.float32).reshape(12, 2)
    it = NativeBatchIterator(data, 4, shuffle=True, seed=3)
    assert it.batches_per_epoch == 3
    ids = []
    for _ in range(3):
        b = it.next()
        ids.extend((b[:, 0] // 2).astype(int).tolist())
    assert sorted(ids) == list(range(12))
    it.close()


def test_rows_are_intact_samples():
    rng = np.random.RandomState(0)
    data = rng.rand(16, 3, 5).astype(np.float32)
    it = NativeBatchIterator(data, 4, shuffle=True, seed=1)
    b = it.next()
    # every batch row must equal some source row exactly
    flat = data.reshape(16, -1)
    for row in b.reshape(4, -1):
        assert any(np.array_equal(row, s) for s in flat)
    it.close()


def test_shuffle_changes_order_and_seed_reproducible():
    data = np.arange(64, dtype=np.float32).reshape(32, 2)
    a = NativeBatchIterator(data, 32, shuffle=True, seed=7).next()
    b = NativeBatchIterator(data, 32, shuffle=True, seed=7).next()
    c = NativeBatchIterator(data, 32, shuffle=True, seed=8).next()
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert not np.array_equal(a[:, 0], np.sort(a[:, 0]))


def test_drop_last_false_short_tail():
    """drop_last=False yields a SHORT final batch covering each sample
    exactly once per epoch (the numpy batch_iterator semantics) - no
    wrap-around padding from the next epoch."""
    data = np.arange(10, dtype=np.float32).reshape(5, 2)
    it = NativeBatchIterator(data, 2, shuffle=False, drop_last=False, seed=0)
    assert it.batches_per_epoch == 3
    seen = [it.next() for _ in range(3)]
    assert [s.shape for s in seen] == [(2, 2), (2, 2), (1, 2)]
    np.testing.assert_array_equal(np.concatenate(seen), data)
    # next epoch starts fresh with a full batch
    assert it.next().shape == (2, 2)
    it.close()


def test_factory_epoch_api():
    data = np.random.RandomState(1).rand(9, 4).astype(np.float32)
    mk = native_batch_iterator(data, 3, seed=2)
    assert sum(1 for _ in mk()) == 3
    assert sum(1 for _ in mk()) == 3  # second epoch works
    mk.iterator.close()


def test_make_train_iterator_prefers_native():
    from inverseproblemwithdiffusionmodel_tpu.training import (
        make_train_iterator)
    data = np.random.RandomState(0).rand(20, 3, 3).astype(np.float32)
    make = make_train_iterator(data, 4, seed=5)
    batches = list(make())
    assert len(batches) == 5
    assert all(b.shape == (4, 3, 3) for b in batches)
    # full epoch coverage under shuffle
    seen = np.concatenate([b.reshape(4, -1) for b in batches])
    assert seen.shape[0] == 20
    if native_available():
        assert hasattr(make, "iterator"), "native path not taken"
    # numpy fallback parity
    make_np = make_train_iterator(data, 4, seed=5, prefer_native=False)
    assert len(list(make_np())) == 5
