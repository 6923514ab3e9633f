"""Debug dump + compare tooling.

Ref: srt/debug_utils/{dumper.py,dump_comparator.py}. With
--debug-dump-dir set, every scheduler batch dumps its forward inputs and
sampled outputs as one .npz; `python -m sglang_tpu.debug_utils compare
A B` diffs two dump directories (e.g. two code revisions, two backends,
CPU vs TPU) and reports the first diverging step/field.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


class StepDumper:
    def __init__(self, dump_dir: str):
        self.dir = dump_dir
        os.makedirs(dump_dir, exist_ok=True)
        self.step = 0

    def snapshot(self, fb) -> dict:
        """Host copies of the forward inputs, taken BEFORE the step jit
        donates the fb buffers."""
        return {
            "input_ids": np.asarray(fb.input_ids),
            "positions": np.asarray(fb.positions),
            "seq_lens": np.asarray(fb.seq_lens),
            "q_lens": np.asarray(fb.q_lens),
            "page_table": np.asarray(fb.page_table),
            "out_cache_loc": np.asarray(fb.out_cache_loc),
            "mode": np.asarray(int(getattr(fb.mode, "value", 0))),
        }

    def dump_batch(self, inputs: dict, out) -> None:
        """One scheduler batch: snapshotted inputs + sampled outputs."""
        arrays = dict(inputs)
        if getattr(out, "next_tokens", None) is not None:
            arrays["next_tokens"] = np.asarray(out.next_tokens)
        if getattr(out, "chosen_logprobs", None) is not None:
            arrays["logprobs"] = np.asarray(out.chosen_logprobs)
        path = os.path.join(self.dir, f"step_{self.step:06d}.npz")
        np.savez_compressed(path, **arrays)
        self.step += 1


def compare_dumps(dir_a: str, dir_b: str, rtol: float = 1e-3,
                  atol: float = 1e-5) -> int:
    """Field-by-field diff of two dump dirs; returns count of diverging
    steps and prints the first divergence per step."""
    files_a = sorted(glob.glob(os.path.join(dir_a, "step_*.npz")))
    files_b = sorted(glob.glob(os.path.join(dir_b, "step_*.npz")))
    n = min(len(files_a), len(files_b))
    if len(files_a) != len(files_b):
        print(f"step-count mismatch: {len(files_a)} vs {len(files_b)}; "
              f"comparing first {n}")
    bad = 0
    for i in range(n):
        a = np.load(files_a[i])
        b = np.load(files_b[i])
        keys = sorted(set(a.files) | set(b.files))
        for k in keys:
            if k not in a.files or k not in b.files:
                print(f"step {i}: field {k} present in only one dump")
                bad += 1
                break
            va, vb = a[k], b[k]
            if va.shape != vb.shape:
                print(f"step {i}: {k} shape {va.shape} vs {vb.shape}")
                bad += 1
                break
            if va.dtype.kind in "iub":
                if not np.array_equal(va, vb):
                    idx = np.argwhere(va != vb)[0]
                    print(f"step {i}: {k} first mismatch at {tuple(idx)}: "
                          f"{va[tuple(idx)]} vs {vb[tuple(idx)]}")
                    bad += 1
                    break
            elif not np.allclose(va, vb, rtol=rtol, atol=atol,
                                 equal_nan=True):
                d = np.abs(va.astype(np.float64) - vb.astype(np.float64))
                print(f"step {i}: {k} max abs diff {d.max():.3e}")
                bad += 1
                break
    print(f"{bad} diverging steps out of {n}")
    return bad


def main(argv=None):
    p = argparse.ArgumentParser("sglang-tpu debug dump tools")
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("compare")
    c.add_argument("dir_a")
    c.add_argument("dir_b")
    c.add_argument("--rtol", type=float, default=1e-3)
    c.add_argument("--atol", type=float, default=1e-5)
    args = p.parse_args(argv)
    if args.cmd == "compare":
        raise SystemExit(
            1 if compare_dumps(args.dir_a, args.dir_b, args.rtol, args.atol)
            else 0
        )


if __name__ == "__main__":
    main()
