"""Native C++ data loader: build, parse parity vs numpy, shuffled-index
determinism, gather parity, minibatch stream."""

import os

import numpy as np
import pytest
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu.data.native import (MinibatchStream,
                                                   PrefetchingLoader,
                                                   gather_rows,
                                                   native_available,
                                                   read_csv,
                                                   shuffled_indices)


@pytest.fixture(scope="module")
def csv_file(tmp_path_factory):
    rng = np.random.RandomState(0)
    data = rng.randn(500, 7)
    path = tmp_path_factory.mktemp("csv") / "test.csv"
    np.savetxt(path, data, delimiter=",")
    return str(path), data


def test_native_builds():
    assert native_available(), "g++ build of csvloader.so failed"


def test_read_csv_parity(csv_file):
    path, data = csv_file
    arr = read_csv(path)
    assert arr.shape == data.shape
    assert_allclose(arr, data, rtol=1e-12)


def test_read_csv_header(tmp_path):
    path = tmp_path / "h.csv"
    with open(path, "w") as f:
        f.write("a,b,c\n1.0,2.0,3.0\n4.0,5.0,6.0\n")
    arr = read_csv(str(path), skip_header=True)
    assert_allclose(arr, [[1, 2, 3], [4, 5, 6]])


def test_shuffled_indices_are_permutations():
    idx1 = shuffled_indices(1000, 42)
    idx2 = shuffled_indices(1000, 42)
    idx3 = shuffled_indices(1000, 43)
    assert np.array_equal(idx1, idx2)          # deterministic
    assert not np.array_equal(idx1, idx3)      # seed-dependent
    assert np.array_equal(np.sort(idx1), np.arange(1000))


def test_gather_rows_parity(csv_file):
    _, data = csv_file
    idx = shuffled_indices(data.shape[0], 7)[:64]
    assert_allclose(gather_rows(data, idx), data[idx])


def test_prefetching_loader_matches_stream():
    """The background pipeline must yield exactly the batches of the
    equivalent synchronous stream (same seed)."""
    X = np.arange(60, dtype=float)[:, None]
    Y = 2 * X
    sync = MinibatchStream(X, Y, batch_size=10, seed=3)
    with PrefetchingLoader(X, Y, batch_size=10, seed=3, depth=2) as pre:
        for _ in range(12):  # two epochs
            xs, ys = sync.next()
            xp, yp = pre.next()
            assert_allclose(xp, xs)
            assert_allclose(yp, ys)


def test_minibatch_stream_covers_epoch():
    X = np.arange(100, dtype=float)[:, None]
    Y = -X
    ms = MinibatchStream(X, Y, batch_size=10, seed=0)
    seen = []
    for _ in range(10):
        xb, yb = ms.next()
        assert xb.shape == (10, 1)
        assert_allclose(yb, -xb)
        seen.append(xb[:, 0])
    seen = np.sort(np.concatenate(seen))
    assert_allclose(seen, np.arange(100))  # one full epoch, no repeats
