"""Custom logit processors (per-request logits hooks).

Ref behavior: srt/sampling/custom_logit_processor.py — a request may ship
a serialized `CustomLogitProcessor` whose `__call__(logits, custom_params)`
rewrites the next-token logits every step; `sampling_params.custom_params`
carries per-request parameters. Gated by --enable-custom-logit-processor.

TPU recast: the processor must be a PURE jax-traceable function — it is
traced INTO the step program (one retrace per distinct processor, cached
by the jit), not executed eagerly per step like the reference's torch
callables. The contract differs from the reference in one deliberate way:
`custom_params` arrives as a dict of [B] jnp arrays (rows stacked across
the batch, 0-filled where absent) rather than a list of python dicts —
param VALUES are traced, so changing a value never recompiles; only a new
processor or a new param-KEY set does.

Request field accepts either:
  {"name": "<registered name>"}            — registry lookup (always on)
  "<base64 pickle>"                        — serialized processor; only
      honored when the server runs --enable-custom-logit-processor
      (pickle deserialization trusts the client, same caveat as the
      reference's dill payloads).

Example:

    class DisallowToken(CustomLogitProcessor):
        def __call__(self, logits, custom_params):
            tok = custom_params["token_id"].astype(jnp.int32)  # [B]
            B, V = logits.shape
            return logits.at[jnp.arange(B), tok].set(-1e30)

    engine.generate(..., custom_logit_processor=DisallowToken().to_str(),
                    sampling_params={"custom_params": {"token_id": 128}})
"""

from __future__ import annotations

import base64
from typing import Callable, Dict, Optional

try:  # cloudpickle serializes closures/local classes (like the
    # reference's dill payloads); plain pickle only handles importables.
    import cloudpickle as _pickle
except ImportError:  # pragma: no cover
    import pickle as _pickle

_REGISTRY: Dict[str, "CustomLogitProcessor"] = {}
_CACHE: Dict[str, "CustomLogitProcessor"] = {}  # payload -> instance


class CustomLogitProcessor:
    """Subclass and implement __call__(logits [B, V] jnp, custom_params:
    dict[str, [B] jnp array]) -> [B, V] jnp. Must be jax-traceable."""

    def __call__(self, logits, custom_params):  # pragma: no cover - ABC
        raise NotImplementedError

    def to_str(self) -> str:
        return base64.b64encode(_pickle.dumps(self)).decode()

    # identity by payload: the SAME deserialized processor must hash
    # equal so the step jit cache hits across requests.
    def _key(self) -> str:
        return type(self).__module__ + "." + type(self).__qualname__

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return (
            type(other) is type(self)
            and getattr(other, "__dict__", None) == self.__dict__
        )


def register_custom_logit_processor(name: str):
    """Register a trusted named processor (plugin entry point)."""

    def deco(obj):
        _REGISTRY[name] = obj() if isinstance(obj, type) else obj
        return obj

    return deco


def resolve_custom_logit_processor(
    spec, allow_pickle: bool
) -> Optional[CustomLogitProcessor]:
    """Resolve a request's custom_logit_processor field to a callable.

    Returns a CACHED instance per payload so jit keys stay stable."""
    if spec is None:
        return None
    if isinstance(spec, dict):
        name = spec.get("name")
        proc = _REGISTRY.get(name)
        if proc is None:
            raise ValueError(f"unknown custom logit processor {name!r}")
        return proc
    if isinstance(spec, str):
        if spec in _REGISTRY:
            return _REGISTRY[spec]
        if not allow_pickle:
            raise ValueError(
                "serialized custom_logit_processor requires "
                "--enable-custom-logit-processor"
            )
        proc = _CACHE.get(spec)
        if proc is None:
            proc = _pickle.loads(base64.b64decode(spec))
            if not callable(proc):
                raise ValueError("custom_logit_processor must be callable")
            _CACHE[spec] = proc
        return proc
    raise ValueError(
        f"bad custom_logit_processor: {type(spec).__name__}"
    )
