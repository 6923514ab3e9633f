"""Inter-manager message structs (ZMQ traffic).

Ref: srt/managers/io_struct.py (GenerateReqInput:160,
TokenizedGenerateReqInput:864, BatchTokenIDOutput:1324, BatchStrOutput:1424,
msgspec-serialized). We use plain dataclasses + pickle protocol 5 (msgspec
isn't in this image); the wire format is an implementation detail behind
send_pyobj/recv_pyobj wrappers in zmq_utils.
"""

from __future__ import annotations

import dataclasses
import uuid
from typing import Any, Dict, List, Optional, Union

from sglang_tpu.sampling.sampling_params import SamplingParams


@dataclasses.dataclass
class GenerateReqInput:
    """User-facing /generate input (pre-tokenization)."""

    text: Optional[Union[str, List[str]]] = None
    input_ids: Optional[Union[List[int], List[List[int]]]] = None
    sampling_params: Optional[Union[Dict, List[Dict]]] = None
    rid: Optional[Union[str, List[str]]] = None
    return_logprob: Union[bool, List[bool]] = False
    logprob_start_len: Union[int, List[int]] = -1
    top_logprobs_num: Union[int, List[int]] = 0
    # Return the model's final hidden state for each generated token
    # (meta_info["hidden_states"], [new_tokens][H]). Ref io_struct.py
    # GenerateReqInput.return_hidden_states.
    return_hidden_states: Union[bool, List[bool]] = False
    # Serialized / named custom logit processor (see
    # sampling/custom_logit_processor.py; ref GenerateReqInput.
    # custom_logit_processor). Per-request params ride
    # sampling_params.custom_params.
    custom_logit_processor: Optional[Union[str, Dict, List]] = None
    stream: bool = False
    lora_path: Optional[Union[str, List[str]]] = None
    # Precomputed input embeddings [T, H] for a SINGLE request (ref
    # GenerateReqInput.input_embeds) — rides the multimodal injection path.
    input_embeds: Optional[Any] = None
    priority: Union[int, List[int]] = 0
    session_params: Optional[Dict] = None
    return_text_in_logprobs: bool = False
    is_embedding: bool = False
    # /v1/score label token ids (shared by every sequence in the batch).
    label_token_ids: Optional[Any] = None
    # Multimodal (round-2 surface)
    image_data: Optional[Any] = None
    # Video input (ref GenerateReqInput.video_data io_struct.py:186):
    # list of frames / np [T,H,W,3] / {"frames": [...]} / .npy path per
    # video; expands through the model's video placeholder token.
    video_data: Optional[Any] = None
    # Audio clips (path / WAV bytes / base64 / data URI / np waveform),
    # one per audio placeholder token (ref GenerateReqInput.audio_data).
    audio_data: Optional[Any] = None
    # PD disaggregation (ref GenerateReqInput.bootstrap_room): pairs this
    # request across a prefill engine and a decode engine. On a prefill
    # engine the KV handoff is published under this room; on a decode
    # engine the request parks until that room's KV arrives.
    bootstrap_room: Optional[str] = None

    def is_batch(self) -> bool:
        if self.text is not None:
            return not isinstance(self.text, str)
        if self.input_ids is not None:
            return bool(self.input_ids) and isinstance(self.input_ids[0], list)
        return False

    def batch_size(self) -> int:
        if not self.is_batch():
            return 1
        return len(self.text if self.text is not None else self.input_ids)

    def normalize(self) -> List["GenerateReqInput"]:
        """Split a batch request into per-item requests."""
        n = self.batch_size()
        if not self.is_batch():
            if self.rid is None:
                self.rid = uuid.uuid4().hex
            return [self]

        def pick(v, i, default=None):
            if isinstance(v, list):
                return v[i] if i < len(v) else default
            return v

        out = []
        for i in range(n):
            out.append(
                GenerateReqInput(
                    text=pick(self.text, i) if self.text is not None else None,
                    input_ids=(
                        pick(self.input_ids, i) if self.input_ids is not None else None
                    ),
                    sampling_params=(
                        self.sampling_params[i]
                        if isinstance(self.sampling_params, list)
                        else self.sampling_params
                    ),
                    rid=(
                        pick(self.rid, i)
                        if isinstance(self.rid, list)
                        else uuid.uuid4().hex
                    ),
                    return_logprob=pick(self.return_logprob, i, False),
                    top_logprobs_num=pick(self.top_logprobs_num, i, 0),
                    return_hidden_states=pick(
                        self.return_hidden_states, i, False),
                    custom_logit_processor=(
                        pick(self.custom_logit_processor, i)
                        if isinstance(self.custom_logit_processor, list)
                        else self.custom_logit_processor),
                    return_text_in_logprobs=self.return_text_in_logprobs,
                    stream=self.stream,
                    lora_path=pick(self.lora_path, i),
                    priority=pick(self.priority, i, 0),
                    is_embedding=self.is_embedding,
                    label_token_ids=self.label_token_ids,
                )
            )
        return out


@dataclasses.dataclass
class TokenizedGenerateReqInput:
    rid: str
    input_ids: List[int]
    sampling_params: SamplingParams
    return_logprob: bool = False
    top_logprobs_num: int = 0
    return_hidden_states: bool = False
    custom_logit_processor: Optional[Union[str, Dict]] = None
    stream: bool = False
    lora_path: Optional[str] = None
    priority: int = 0
    is_embedding: bool = False
    input_embeds: Optional[Any] = None  # np [T, H]
    # /v1/score: probabilities of these token ids at the next-token
    # position are returned through the embedding channel (ref
    # ScoringRequest.label_token_ids, openai/serving_score.py).
    label_token_ids: Optional[Any] = None
    # Multimodal images: list of dicts {pixel_values (np), grid_thw,
    # mm_hash, offset (first placeholder token index), num_tokens}
    # produced by TokenizerManager's processor; the scheduler runs the
    # ViT at admission (cached by mm_hash). Ref: srt/multimodal.
    mm_inputs: Optional[Any] = None
    bootstrap_room: Optional[str] = None


@dataclasses.dataclass
class BatchTokenOut:
    """Scheduler -> Detokenizer: one step's new tokens."""

    rids: List[str]
    tokens: List[int]
    finish_reasons: List[Optional[dict]]  # None = not finished
    logprobs: List[Optional[float]]
    top_logprobs: List[Optional[Any]]
    completion_tokens: List[int]
    cached_tokens: List[int]
    prompt_tokens: List[int]
    embeddings: List[Optional[List[float]]]
    skip_special_tokens: List[bool]
    spaces_between_special_tokens: List[bool]
    stop_strs: List[Optional[List[str]]]
    no_stop_trim: List[bool]
    # per-token hidden-state vectors ([H] lists) for reqs that asked
    hidden_states: List[Optional[Any]] = dataclasses.field(
        default_factory=list)


@dataclasses.dataclass
class BatchStrOut:
    """Detokenizer -> TokenizerManager: decoded text deltas."""

    rids: List[str]
    delta_texts: List[str]
    output_ids: List[List[int]]  # new token ids since last emit
    finish_reasons: List[Optional[dict]]
    logprobs: List[Optional[float]]
    top_logprobs: List[Optional[Any]]
    completion_tokens: List[int]
    cached_tokens: List[int]
    prompt_tokens: List[int]
    embeddings: List[Optional[List[float]]]
    hidden_states: List[Optional[Any]] = dataclasses.field(
        default_factory=list)


@dataclasses.dataclass
class AbortReq:
    rid: str


@dataclasses.dataclass
class FlushCacheReq:
    pass


@dataclasses.dataclass
class FlushCacheResp:
    success: bool


@dataclasses.dataclass
class GetServerInfoReq:
    pass


@dataclasses.dataclass
class GetServerInfoResp:
    info: Dict[str, Any]


@dataclasses.dataclass
class HealthCheckReq:
    pass


@dataclasses.dataclass
class HealthCheckResp:
    ok: bool


@dataclasses.dataclass
class InitWeightsGroupReq:
    """RL weight-sync channel (ref init_weights_update_group,
    model_runner_components/weight_updater.py:67): the TPU-native analog
    of the NCCL broadcast group is a ZMQ PULL socket connected to the
    trainer's PUSH endpoint (tcp:// across hosts = DCN, ipc:// local)."""
    group_addr: str


@dataclasses.dataclass
class InitWeightsGroupResp:
    success: bool
    message: str = ""


@dataclasses.dataclass
class UpdateWeightsFromDistributedReq:
    """Receive `names` tensors from the weight group and apply them (ref
    update_weights_from_distributed, weight_updater.py:222)."""
    names: List[str]
    timeout: float = 120.0


@dataclasses.dataclass
class PauseGenerationReq:
    """Pause/resume launching new forward batches (ref /pause_generation +
    /continue_generation). In-flight device work drains; queued requests
    stay queued."""
    pause: bool


@dataclasses.dataclass
class PauseGenerationResp:
    success: bool


@dataclasses.dataclass
class ExpertDistributionReq:
    """EPLB recording control (ref /start_expert_distribution_record +
    srt/eplb/expert_distribution.py). action: start | stop | dump."""
    action: str


@dataclasses.dataclass
class ExpertDistributionResp:
    success: bool
    data: Optional[Any] = None


@dataclasses.dataclass
class EplbRebalanceReq:
    """Recompute expert placement from recorded loads and permute expert
    weights (ref srt/eplb/eplb_manager.py rebalance). When dead_ranks is
    not None this is an elastic-EP scale event (ref
    srt/elastic_ep/elastic_ep.py): placement excludes those EP shards
    (empty list = restore all shards)."""
    dead_ranks: Optional[list] = None


@dataclasses.dataclass
class EplbRebalanceResp:
    success: bool
    message: str = ""


@dataclasses.dataclass
class UpdateWeightsReq:
    model_path: str
    load_format: str = "auto"


@dataclasses.dataclass
class UpdateWeightsResp:
    success: bool
    message: str = ""


@dataclasses.dataclass
class UpdateWeightsFromTensorReq:
    """RL weight push: [(hf_name, np.ndarray)] (pickled over local ZMQ)."""

    named_tensors: List  # List[Tuple[str, np.ndarray]]


@dataclasses.dataclass
class LoadLoRAAdapterReq:
    """Dynamic adapter load (ref /load_lora_adapter, http_server.py:1519)."""

    lora_name: str
    lora_path: str


@dataclasses.dataclass
class UnloadLoRAAdapterReq:
    lora_name: str


@dataclasses.dataclass
class LoRAUpdateResp:
    success: bool
    message: str = ""
    loaded_adapters: Optional[List[str]] = None


@dataclasses.dataclass
class ReleaseMemoryReq:
    tags: List[str] = dataclasses.field(default_factory=lambda: ["kv_cache"])


@dataclasses.dataclass
class ReleaseMemoryResp:
    success: bool
    message: str = ""


@dataclasses.dataclass
class ResumeMemoryReq:
    tags: List[str] = dataclasses.field(default_factory=lambda: ["kv_cache"])


@dataclasses.dataclass
class ResumeMemoryResp:
    success: bool
    message: str = ""


@dataclasses.dataclass
class SchedulerReady:
    ok: bool
    info: Dict[str, Any] = dataclasses.field(default_factory=dict)
