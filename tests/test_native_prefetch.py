"""C++ async prefetcher: build, ordering, looping, npz decode, error path."""

import os

import numpy as np
import pytest

from hallo_tpu.data.native_prefetch import FilePrefetcher, _build


def test_native_build():
    assert _build() is not None, "g++ toolchain expected in this image"


def test_prefetch_order_and_content(tmp_path):
    paths = []
    for i in range(5):
        p = tmp_path / f"f{i}.bin"
        p.write_bytes(bytes([i]) * (i + 1) * 100)
        paths.append(str(p))
    pf = FilePrefetcher(paths, capacity=2, workers=3)
    got = list(pf)
    pf.close()
    assert len(got) == 5
    for i, blob in enumerate(got):
        assert blob == bytes([i]) * (i + 1) * 100


def test_prefetch_capacity_smaller_than_workers(tmp_path):
    """Regression: with workers > capacity, racing producers could fill the
    ring with out-of-order indices while the producer holding the index the
    consumer needs blocked on ring space — deadlock. Admission is now gated
    on the consume-index window."""
    paths = []
    for i in range(64):
        p = tmp_path / f"s{i}.bin"
        p.write_bytes(bytes([i]) * (1 + (i * 37) % 300))
        paths.append(str(p))
    for _ in range(3):  # scheduling-dependent: a few rounds raise exposure
        pf = FilePrefetcher(paths, capacity=1, workers=4)
        got = list(pf)
        pf.close()
        assert [len(b) for b in got] == [1 + (i * 37) % 300 for i in range(64)]


def test_prefetch_loop(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"abc")
    pf = FilePrefetcher([str(p)], capacity=2, workers=1, loop=True)
    it = iter(pf)
    for _ in range(7):
        assert next(it) == b"abc"
    pf.close()


def test_prefetch_npz(tmp_path):
    p = tmp_path / "clip.npz"
    np.savez(p, frames=np.arange(12).reshape(3, 4), emb=np.ones(5))
    pf = FilePrefetcher([str(p)])
    items = list(pf.iter_npz())
    pf.close()
    np.testing.assert_array_equal(items[0]["frames"], np.arange(12).reshape(3, 4))


def test_prefetch_missing_file(tmp_path):
    pf = FilePrefetcher([str(tmp_path / "nope.bin")])
    if pf._lib is None:
        pytest.skip("native lib unavailable")
    with pytest.raises(IOError):
        list(pf)
    pf.close()
