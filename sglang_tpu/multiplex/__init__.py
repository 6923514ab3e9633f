from sglang_tpu.multiplex.pdmux import PDMuxCoordinator

__all__ = ["PDMuxCoordinator"]
