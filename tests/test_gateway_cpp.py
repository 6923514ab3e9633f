"""Native gateway core (csrc/gateway_core.cpp): radix tree semantics,
selection policies, circuit breaker, LRU eviction.

Ref: sgl-model-gateway/src/policies/{cache_aware.rs,tree.rs}.
"""

import pytest

from sglang_tpu.gateway_core import GatewayCore


@pytest.fixture()
def core():
    return GatewayCore(max_nodes=256)


def test_tree_match_path_compressed(core):
    w0 = core.add_worker()
    w1 = core.add_worker()
    core.insert("hello world, how are you", w0)
    core.insert("hello there", w1)
    assert core.match("hello world, how", w0) == len("hello world, how")
    # w1 shares only the "hello " prefix branch
    m1 = core.match("hello world", w1)
    assert 0 < m1 <= len("hello ")
    assert core.match("goodbye", w0) == 0
    # splitting preserved both tenants on the shared prefix
    assert core.match("hello", w0) == 5
    assert core.match("hello", w1) == 5


def test_pick_cache_aware_prefers_prefix_owner(core):
    w0 = core.add_worker()
    w1 = core.add_worker()
    core.insert("the quick brown fox", w0)
    assert core.pick("the quick brown fox jumps") == w0
    assert core.last_matched() >= len("the quick brown fox") - 1
    # no match at all -> least inflight
    core.inc_inflight(w0)
    assert core.pick("zzz unrelated") == w1
    # deep-match owner overloaded beyond tolerance -> shortest queue wins
    for _ in range(20):
        core.inc_inflight(w0)
    assert core.pick("the quick brown fox") == w1


def test_policies_and_registry(core):
    w0 = core.add_worker()
    w1 = core.add_worker()
    w2 = core.add_worker()
    picks = {core.pick("", policy="round_robin") for _ in range(6)}
    assert picks == {w0, w1, w2}
    core.inc_inflight(w0)
    core.inc_inflight(w1)
    assert core.pick("", policy="shortest_queue") == w2
    assert core.inflight(w0) == 1
    core.dec_inflight(w0)
    assert core.inflight(w0) == 0
    core.remove_worker(w2)
    assert not core.healthy(w2)
    assert core.pick("", policy="shortest_queue") in (w0, w1)


def test_circuit_breaker(core):
    w0 = core.add_worker()
    w1 = core.add_worker()
    assert core.record_failure(w0, threshold=3)
    assert core.record_failure(w0, threshold=3)
    assert not core.record_failure(w0, threshold=3)  # tripped
    assert not core.healthy(w0)
    assert core.pick("anything") == w1
    core.set_health(w0, True)  # recovery resets the breaker
    assert core.healthy(w0)
    assert core.record_failure(w0, threshold=3)  # count restarted


def test_lru_eviction_caps_nodes():
    core = GatewayCore(max_nodes=64)
    w = core.add_worker()
    for i in range(500):
        core.insert(f"unique prefix number {i} with some tail text", w)
    assert core.node_count() <= 64
    # recent entries survive eviction
    core.insert("fresh entry abcdef", w)
    assert core.match("fresh entry abcdef", w) > 0


def test_no_workers():
    core = GatewayCore()
    assert core.pick("x") == -1


def test_router_uses_native_core():
    from sglang_tpu.router import Router

    r = Router(["http://a", "http://b"], policy="cache_aware")
    assert r.core is not None
    r.record_insert("shared prefix request one", 0)
    idx, w = r.pick("shared prefix request two")
    assert idx == 0


def test_power_of_two_prefers_lower_load():
    core = GatewayCore()
    w0, w1 = core.add_worker("http://a"), core.add_worker("http://b")
    for _ in range(20):
        core.inc_inflight(w0)
    # with only two workers, po2 always compares both -> always w1
    for _ in range(16):
        assert core.pick("x", "power_of_two") == w1


def test_consistent_hashing_stable_and_redistributes_minimally():
    core = GatewayCore()
    urls = [f"http://w{i}" for i in range(4)]
    ids = [core.add_worker(u) for u in urls]
    keys = [f"session-{i}" for i in range(200)]
    before = {k: core.pick("", "consistent_hashing", key=k) for k in keys}
    # same key -> same worker, always
    for k in keys:
        assert core.pick("", "consistent_hashing", key=k) == before[k]
    # removing one worker only remaps that worker's keys
    core.remove_worker(ids[2])
    moved = 0
    for k in keys:
        now = core.pick("", "consistent_hashing", key=k)
        assert now != ids[2]
        if before[k] != ids[2] and now != before[k]:
            moved += 1
    assert moved == 0, f"{moved} unaffected keys remapped"


def test_consistent_hashing_keyless_falls_back():
    core = GatewayCore()
    core.add_worker("http://a")
    assert core.pick("", "consistent_hashing") >= 0


def test_prefix_hash_groups_and_balances():
    core = GatewayCore()
    for i in range(4):
        core.add_worker(f"http://w{i}")
    # same prefix -> same worker
    a = core.pick("the shared long prefix " * 8, "prefix_hash")
    b = core.pick("the shared long prefix " * 8, "prefix_hash")
    assert a == b
    # overload the chosen worker -> falls back to least loaded
    for _ in range(50):
        core.inc_inflight(a)
    c = core.pick("the shared long prefix " * 8, "prefix_hash")
    assert c != a


def test_manual_sticky_until_unhealthy():
    core = GatewayCore()
    ids = [core.add_worker(f"http://w{i}") for i in range(3)]
    w = core.pick("", "manual", key="room-1")
    for _ in range(10):
        assert core.pick("", "manual", key="room-1") == w
    # adding a worker must NOT remap (stronger than consistent hashing)
    core.add_worker("http://w3")
    assert core.pick("", "manual", key="room-1") == w
    # unhealthy pinned worker -> remap to a healthy one, then sticky again
    core.set_health(w, False)
    w2 = core.pick("", "manual", key="room-1")
    assert w2 != w
    assert core.pick("", "manual", key="room-1") == w2


def test_bucket_policy_groups_by_key():
    core = GatewayCore()
    for i in range(4):
        core.add_worker(f"http://w{i}")
    # a single-bucket workload: repeated key routes within a stable set
    first = core.pick("body text", "bucket", key="model-a")
    assert first >= 0
    seen = {core.pick("body text", "bucket", key="model-a")
            for _ in range(8)}
    assert len(seen) <= 2  # small share -> narrow worker set


def test_router_policy_fallbacks_python():
    from sglang_tpu.gateway.app import Router

    for policy in ("power_of_two", "consistent_hashing", "prefix_hash",
                   "bucket", "manual"):
        r = Router(["http://a", "http://b"], policy=policy,
                   use_native=False)
        idx, w = r.pick("some request text", key="k1")
        assert 0 <= idx < 2
        if policy in ("consistent_hashing", "manual"):
            again, _ = r.pick("other text", key="k1")
            assert again == idx
