"""dLLM configuration (ref srt/dllm/config.py).

Known diffusion-LM families ship their block size + mask token id; both
are overridable from ServerArgs (--dllm-block-size / --dllm-mask-id) so
unknown checkpoints can still run.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

# ref srt/dllm/config.py DLLM_PARAMS
DLLM_PARAMS = {
    "LLaDA2MoeModelLM": {"block_size": 32, "mask_id": 156895},
    "SDARForCausalLM": {"block_size": 4, "mask_id": 151669},
    "SDARMoeForCausalLM": {"block_size": 4, "mask_id": 151669},
}


@dataclasses.dataclass
class DllmConfig:
    algorithm: str = "low_confidence"
    block_size: int = 4
    mask_id: int = 0
    threshold: float = 0.95

    @staticmethod
    def from_server_args(server_args, architectures=None
                         ) -> Optional["DllmConfig"]:
        if not getattr(server_args, "dllm_algorithm", None):
            return None
        block_size = server_args.dllm_block_size
        mask_id = server_args.dllm_mask_id
        for arch in architectures or []:
            params = DLLM_PARAMS.get(arch)
            if params is not None:
                block_size = block_size or params["block_size"]
                mask_id = mask_id if mask_id is not None else params["mask_id"]
        if not block_size or mask_id is None:
            raise ValueError(
                "unknown diffusion LLM: pass --dllm-block-size and "
                "--dllm-mask-id for architectures outside DLLM_PARAMS"
            )
        return DllmConfig(
            algorithm=server_args.dllm_algorithm,
            block_size=int(block_size),
            mask_id=int(mask_id),
            threshold=float(server_args.dllm_threshold),
        )
