"""CLI: `python -m sglang_tpu.cli serve|generate|encode ...`

Ref: python/sglang/cli/{main.py,serve.py} (`sglang serve/generate`).
"""

from __future__ import annotations

import argparse
import json
import sys


def _serve(argv):
    from sglang_tpu.entrypoints.http_server import launch_server
    from sglang_tpu.server_args import prepare_server_args

    launch_server(prepare_server_args(argv))


def _generate(argv):
    parser = argparse.ArgumentParser("sglang-tpu generate")
    parser.add_argument("--prompt", type=str, required=True)
    parser.add_argument("--max-new-tokens", type=int, default=128)
    parser.add_argument("--temperature", type=float, default=0.0)
    from sglang_tpu.server_args import ServerArgs

    ServerArgs.add_cli_args(parser)
    args = parser.parse_args(argv)
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.server_args import ServerArgs as SA

    sa = SA.from_cli_args(args)
    sa.enable_single_process = True
    eng = Engine(server_args=sa)
    out = eng.generate(
        prompt=args.prompt,
        sampling_params={
            "max_new_tokens": args.max_new_tokens,
            "temperature": args.temperature,
        },
    )
    print(json.dumps(out, indent=2))


def _encode(argv):
    parser = argparse.ArgumentParser("sglang-tpu encode")
    parser.add_argument("--text", type=str, required=True)
    from sglang_tpu.server_args import ServerArgs

    ServerArgs.add_cli_args(parser)
    args = parser.parse_args(argv)
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.server_args import ServerArgs as SA

    sa = SA.from_cli_args(args)
    sa.enable_single_process = True
    eng = Engine(server_args=sa)
    out = eng.encode(prompt=args.text)
    print(json.dumps(out))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: sglang-tpu {serve|generate|encode} [args...]")
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "serve":
        _serve(rest)
    elif cmd == "generate":
        _generate(rest)
    elif cmd == "encode":
        _encode(rest)
    else:
        print(f"unknown command {cmd!r}; use serve|generate|encode")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
