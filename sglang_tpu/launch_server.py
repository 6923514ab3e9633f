"""`python -m sglang_tpu.launch_server --model-path ...`

Ref: python/sglang/launch_server.py:16-52.
"""

from __future__ import annotations

import sys

from sglang_tpu.entrypoints.http_server import launch_server
from sglang_tpu.server_args import prepare_server_args

if __name__ == "__main__":
    server_args = prepare_server_args(sys.argv[1:])
    launch_server(server_args)
