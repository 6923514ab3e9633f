"""L3 storage backend factory: put/get/evict parity across all backends.

Ref: srt/mem_cache/storage/backend_factory.py — pluggable stores behind
one interface. Every backend here must behave identically for the
HostKVTier spill path: exact roundtrip, None on miss, LRU-bounded."""

import numpy as np
import pytest

from sglang_tpu.mem.storage import BACKENDS, create_storage_backend


def _page(seed, shape=(4, 8), dtype=np.float32):
    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        return rng.standard_normal(shape).astype(dtype)
    return rng.integers(0, 127, shape).astype(dtype)


@pytest.fixture
def backend_of(tmp_path):
    """Factory fixture resolving a backend name to a live tier (spinning
    up the toy server for the remote classes)."""
    cleanups = []

    def make(name, max_bytes=8 << 30):
        if name == "resp":
            from sglang_tpu.mem.storage.resp import MiniRespServer

            server = MiniRespServer(max_bytes=max_bytes)
            cleanups.append(server.shutdown)
            return create_storage_backend(
                f"resp://127.0.0.1:{server.port}", None, max_bytes
            )
        if name == "zmq":
            from sglang_tpu.mem.storage.zmq_store import ZmqStorageServer

            server = ZmqStorageServer(max_bytes=max_bytes)
            cleanups.append(server.shutdown)
            return create_storage_backend(
                f"zmq://{server.addr}", None, max_bytes
            )
        if name == "http":
            from sglang_tpu.mem.storage.http_store import HttpStorageServer

            server = HttpStorageServer(max_bytes=max_bytes)
            cleanups.append(server.shutdown)
            return create_storage_backend(server.url, None, max_bytes)
        return create_storage_backend(name, str(tmp_path / name), max_bytes)

    yield make
    for fn in cleanups:
        fn()


@pytest.mark.parametrize("name", BACKENDS)
def test_roundtrip_and_miss(name, backend_of):
    tier = backend_of(name)
    key_a, key_b = (1, 2, 3), (9, 9)
    page = _page(0)
    tier.put(key_a, page)
    got = tier.get(key_a)
    np.testing.assert_array_equal(got, page)
    assert tier.get(key_b) is None
    # overwrite wins
    page2 = _page(1)
    tier.put(key_a, page2)
    np.testing.assert_array_equal(tier.get(key_a), page2)


@pytest.mark.parametrize("name", BACKENDS)
def test_dtype_shape_preserved(name, backend_of):
    tier = backend_of(name)
    page = _page(2, shape=(2, 3, 5), dtype=np.int8)
    tier.put((7,), page)
    got = tier.get((7,))
    assert got.dtype == np.int8 and got.shape == (2, 3, 5)
    np.testing.assert_array_equal(got, page)


@pytest.mark.parametrize("name", [b for b in BACKENDS if b != "zmq"])
def test_lru_eviction(name, backend_of):
    # budget for ~4 pages of 128 f32 bytes*... page = 4*8*4 = 128 bytes
    # (zlib stores compressed sizes; give it the same logical budget)
    tier = backend_of(name, max_bytes=4 * 128)
    pages = {i: _page(i) for i in range(8)}
    for i in range(8):
        tier.put((i,), pages[i])
    # oldest keys evicted, newest survive
    assert tier.get((7,)) is not None
    assert tier.get((0,)) is None


def test_native_batched_io(backend_of):
    tier = backend_of("native")
    keys = [(i, i + 1) for i in range(16)]
    pages = [_page(100 + i) for i in range(16)]
    tier.put_batch(keys, pages)
    got = tier.get_batch(keys + [(999,)])
    for i in range(16):
        np.testing.assert_array_equal(got[i], pages[i])
    assert got[16] is None
    tier.close()


def test_unknown_backend_raises():
    with pytest.raises(ValueError):
        create_storage_backend("s3", "/tmp/x")


def test_hicache_controller_with_sqlite(tmp_path, tiny_llama_dir):
    """End-to-end: evicted host pages spill into the sqlite tier and
    restore after the host tier is flushed (ref hiradix L3 fetch)."""
    from tests.test_hicache import _roundtrip_with_storage

    _roundtrip_with_storage(tmp_path, tiny_llama_dir, backend="sqlite")


def test_hicache_controller_with_native(tmp_path, tiny_llama_dir):
    from tests.test_hicache import _roundtrip_with_storage

    _roundtrip_with_storage(tmp_path, tiny_llama_dir, backend="native")
