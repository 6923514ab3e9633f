"""Plugin framework (ref srt/plugins/) + typed env registry (ref
srt/environ.py) unit tests."""

import os
import sys
import textwrap

from sglang_tpu.environ import envs, iter_fields, snapshot


def test_env_defaults_and_parse(monkeypatch):
    monkeypatch.delenv("SGLANG_TPU_WATCHDOG_TIMEOUT", raising=False)
    assert envs.SGLANG_TPU_WATCHDOG_TIMEOUT.get() == 300.0
    monkeypatch.setenv("SGLANG_TPU_WATCHDOG_TIMEOUT", "12.5")
    assert envs.SGLANG_TPU_WATCHDOG_TIMEOUT.get() == 12.5
    monkeypatch.setenv("SGLANG_TPU_KV_CANARY", "true")
    assert envs.SGLANG_TPU_KV_CANARY.get() is True
    monkeypatch.setenv("SGLANG_TPU_KV_CANARY", "0")
    assert envs.SGLANG_TPU_KV_CANARY.get() is False
    # invalid value -> warn + default, not crash
    monkeypatch.setenv("SGLANG_TPU_MAX_COMPILE_SHAPES", "not_an_int")
    assert envs.SGLANG_TPU_MAX_COMPILE_SHAPES.get() == 64


def test_env_override_context():
    base = envs.SGLANG_TPU_LOG_LEVEL.get()
    with envs.SGLANG_TPU_LOG_LEVEL.override("debug"):
        assert envs.SGLANG_TPU_LOG_LEVEL.get() == "debug"
        assert os.environ["SGLANG_TPU_LOG_LEVEL"] == "debug"
    assert envs.SGLANG_TPU_LOG_LEVEL.get() == base


def test_env_registry_enumerable():
    names = [n for n, _ in iter_fields()]
    assert "SGLANG_TPU_CACHE_DIR" in names
    assert len(names) >= 20
    snap = snapshot()
    assert snap["SGLANG_TPU_HTTP_TIMEOUT"] == 3600.0


def test_plugin_loading(tmp_path, monkeypatch):
    """A plugin module registers a model + request hook and both fire."""
    mod = tmp_path / "demo_plugin.py"
    mod.write_text(textwrap.dedent("""
        CALLS = []

        class FakeModel:
            pass

        def sglang_tpu_plugin(registry):
            registry.register_model("DemoPluginForCausalLM", FakeModel)
            registry.on_request(lambda gri: CALLS.append(gri))
    """))
    monkeypatch.syspath_prepend(str(tmp_path))
    from sglang_tpu.plugins import load_plugins

    reg = load_plugins("demo_plugin")
    assert "demo_plugin" in reg.loaded
    from sglang_tpu.models.registry import get_model_class

    cls = get_model_class(["DemoPluginForCausalLM"])
    assert cls.__name__ == "FakeModel"

    class Dummy:
        pass

    reg.fire_request(Dummy())
    assert len(sys.modules["demo_plugin"].CALLS) == 1
    # loading again is a no-op (idempotent)
    reg2 = load_plugins("demo_plugin")
    assert reg2.loaded.count("demo_plugin") == 1


def test_plugin_missing_module_is_nonfatal():
    from sglang_tpu.plugins import load_plugins

    reg = load_plugins("no.such.module")
    assert "no.such.module" not in reg.loaded


def test_plugin_storage_backend(tmp_path, monkeypatch):
    mod = tmp_path / "store_plugin.py"
    mod.write_text(textwrap.dedent("""
        class DictTier:
            def __init__(self):
                self.d = {}
            def put(self, key, page):
                self.d[key] = page.copy()
            def get(self, key):
                return self.d.get(key)

        def sglang_tpu_plugin(registry):
            registry.register_storage_backend(
                "dict", lambda directory, max_bytes: DictTier())
    """))
    monkeypatch.syspath_prepend(str(tmp_path))
    from sglang_tpu.plugins import load_plugins

    load_plugins("store_plugin")
    import numpy as np

    import sglang_tpu.mem.storage as storage

    tier = storage.create_storage_backend("dict", None)
    page = np.arange(6.0).reshape(2, 3)
    tier.put((1,), page)
    np.testing.assert_array_equal(tier.get((1,)), page)
    # the stock backends still resolve through the patched factory
    ft = storage.create_storage_backend("file", str(tmp_path / "f"))
    assert ft is not None
