"""DSL surface: sgl.function / gen / select / role tags.

Ref: python/sglang/lang/api.py:23-289 (behavioral); execution model is a
simple sequential interpreter (the reference's StreamExecutor pipeline,
lang/interpreter.py:274, collapsed to synchronous evaluation — async
parallelism is a planned extension).
"""

from __future__ import annotations

import dataclasses
import functools
import re
from typing import Any, Callable, Dict, List, Optional, Union

_DEFAULT_BACKEND = None


def set_default_backend(backend) -> None:
    global _DEFAULT_BACKEND
    _DEFAULT_BACKEND = backend


# ------------------------------------------------------------------- nodes
@dataclasses.dataclass
class Gen:
    name: Optional[str] = None
    max_tokens: int = 128
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    stop: Optional[Union[str, List[str]]] = None
    regex: Optional[str] = None
    json_schema: Optional[str] = None
    ignore_eos: bool = False


@dataclasses.dataclass
class Select:
    name: Optional[str]
    choices: List[str]


@dataclasses.dataclass
class Image:
    """Multimodal prompt item (ref lang/api.py image): any image_data form
    the server accepts (path/URL/base64/PIL/np)."""

    def __init__(self, data):
        self.data = data


class Video:
    """Video prompt item (ref lang/api.py video): frames list / np array /
    {"frames": [...]} — see GenerateReqInput.video_data."""

    def __init__(self, data):
        self.data = data


def image(data) -> "Image":
    return Image(data)


def video(data) -> "Video":
    return Video(data)


class RoleBegin:
    role: str


@dataclasses.dataclass
class RoleEnd:
    role: str


def gen(name: Optional[str] = None, max_tokens: int = 128,
        temperature: float = 1.0, top_p: float = 1.0, top_k: int = -1,
        stop=None, regex=None, json_schema=None, ignore_eos=False) -> Gen:
    return Gen(name, max_tokens, temperature, top_p, top_k, stop, regex,
               json_schema, ignore_eos)


def gen_int(name: Optional[str] = None, max_tokens: int = 16,
            **kwargs) -> Gen:
    return Gen(name, max_tokens, regex=r"\d{1,10}", **kwargs)


def select(name: Optional[str] = None, choices: Optional[List[str]] = None) -> Select:
    return Select(name, choices or [])


class _RoleCtx:
    def __init__(self, state: "ProgramState", role: str):
        self.state = state
        self.role = role

    def __enter__(self):
        self.state.begin_role(self.role)
        return self.state

    def __exit__(self, *a):
        self.state.end_role(self.role)


def system(state: "ProgramState") -> _RoleCtx:
    return _RoleCtx(state, "system")


def user(state: "ProgramState") -> _RoleCtx:
    return _RoleCtx(state, "user")


def assistant(state: "ProgramState") -> _RoleCtx:
    return _RoleCtx(state, "assistant")


# -------------------------------------------------------------- interpreter
class ProgramState:
    def __init__(self, backend):
        self.backend = backend
        self.text_parts: List[str] = []
        self.messages: List[Dict[str, str]] = []
        self.variables: Dict[str, Any] = {}
        self.images: List[Any] = []
        self.videos: List[Any] = []
        self._role: Optional[str] = None
        self._role_buf: List[str] = []

    def fork(self, n: int) -> List["ProgramState"]:
        """n independent continuations sharing this prefix (ref
        lang/interpreter.py fork): each fork gets a COPY of the state;
        run them concurrently with `sgl.run_parallel` or any executor."""
        import copy as _copy

        out = []
        for _ in range(n):
            st = ProgramState(self.backend)
            st.text_parts = list(self.text_parts)
            st.messages = _copy.deepcopy(self.messages)
            st.variables = dict(self.variables)
            st.images = list(self.images)
            st.videos = list(self.videos)
            st._role = self._role
            st._role_buf = list(self._role_buf)
            out.append(st)
        return out

    # state += fragment
    def __iadd__(self, other):
        self.append(other)
        return self

    def append(self, item) -> None:
        if isinstance(item, str):
            self._emit(item)
        elif isinstance(item, Gen):
            out = self.backend.generate(self._prompt(), item,
                                        images=self.images or None,
                                        videos=self.videos or None)
            if item.name:
                self.variables[item.name] = out
            self._emit(out)
        elif isinstance(item, Image):
            self.images.append(item.data)
            self._emit("<image>")
        elif isinstance(item, Video):
            self.videos.append(item.data)
            self._emit("<video>")
        elif isinstance(item, Select):
            pattern = "(" + "|".join(re.escape(c) for c in item.choices) + ")"
            out = self.backend.generate(
                self._prompt(),
                Gen(max_tokens=64, temperature=0.0, regex=pattern),
                images=self.images or None,
                videos=self.videos or None,
            )
            if item.name:
                self.variables[item.name] = out
            self._emit(out)
        else:
            raise TypeError(f"cannot append {type(item)}")

    def _emit(self, text: str) -> None:
        if self._role is not None:
            self._role_buf.append(text)
        else:
            self.text_parts.append(text)

    def begin_role(self, role: str) -> None:
        self._role = role
        self._role_buf = []

    def end_role(self, role: str) -> None:
        self.messages.append({"role": role, "content": "".join(self._role_buf)})
        self._role = None

    def _prompt(self):
        if self.messages or self._role is not None:
            msgs = list(self.messages)
            if self._role is not None and self._role_buf:
                msgs = msgs + [
                    {"role": self._role, "content": "".join(self._role_buf)}
                ]
            return msgs
        return "".join(self.text_parts)

    def text(self) -> str:
        return "".join(self.text_parts)

    def __getitem__(self, name: str):
        return self.variables[name]


class SglFunction:
    """Ref: lang/ir.py:141 (SglFunction.run / run_batch)."""

    def __init__(self, fn: Callable):
        self.fn = fn
        functools.update_wrapper(self, fn)

    def run(self, *args, backend=None, **kwargs) -> ProgramState:
        backend = backend or _DEFAULT_BACKEND
        if backend is None:
            raise RuntimeError("no backend; call sgl.set_default_backend()")
        state = ProgramState(backend)
        self.fn(state, *args, **kwargs)
        return state

    def run_batch(self, arg_list: List[Dict], backend=None,
                  num_threads: int = 8) -> List[ProgramState]:
        """Run many program instances CONCURRENTLY (ref lang run_batch:
        threads drive the interpreter so the server batches them)."""
        from concurrent.futures import ThreadPoolExecutor

        if len(arg_list) <= 1:
            return [self.run(backend=backend, **args) for args in arg_list]
        with ThreadPoolExecutor(max_workers=num_threads) as pool:
            futs = [pool.submit(self.run, backend=backend, **args)
                    for args in arg_list]
            return [f.result() for f in futs]

    def __call__(self, *args, **kwargs):
        return self.run(*args, **kwargs)


def function(fn: Callable) -> SglFunction:
    return SglFunction(fn)


def run_parallel(fns_and_states, num_threads: int = 8):
    """Drive forked continuations concurrently: items are (callable,
    state) pairs; each callable mutates its state (ref interpreter
    fork/join). Returns the states in order."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        futs = [pool.submit(fn, st) for fn, st in fns_and_states]
        for f in futs:
            f.result()
    return [st for _, st in fns_and_states]
