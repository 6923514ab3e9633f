"""Audio loading + Whisper log-mel features (from-scratch numpy,
HF-numerics-exact) + the Qwen2-Audio multimodal processor.

Ref behavior: srt/multimodal/processors/qwen_audio.py + HF
WhisperFeatureExtractor (transformers audio_utils spectrogram /
mel_filter_bank, slaney scale+norm) and Qwen2AudioProcessor's
placeholder-length math (_get_feat_extract_output_lengths). No librosa
or soundfile in the image: WAV parsing is stdlib `wave`, resampling is
polyphase-free linear interpolation (adequate for speech features).
"""

from __future__ import annotations

import base64
import dataclasses
import hashlib
import io
import wave
from typing import Optional, Tuple

import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
CHUNK_SECONDS = 30
MAX_SAMPLES = SAMPLE_RATE * CHUNK_SECONDS  # 480000
MAX_FRAMES = MAX_SAMPLES // HOP  # 3000


# ---------------------------------------------------------------- loading

def load_audio(data, target_sr: int = SAMPLE_RATE) -> np.ndarray:
    """Accepts a numpy array (assumed target_sr), local path, raw WAV
    bytes, base64, or data URI. Returns float32 mono in [-1, 1]."""
    if isinstance(data, np.ndarray):
        return data.astype(np.float32)
    if isinstance(data, str):
        if data.startswith("data:"):
            data = base64.b64decode(data.split(",", 1)[1])
        elif len(data) > 512 or not any(c in data for c in "/\\."):
            try:
                data = base64.b64decode(data, validate=True)
            except Exception:
                pass
    if isinstance(data, str):
        with open(data, "rb") as f:
            data = f.read()
    return _decode_wav(data, target_sr)


def _decode_wav(raw: bytes, target_sr: int) -> np.ndarray:
    with wave.open(io.BytesIO(raw)) as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        pcm = w.readframes(n)
    if width == 2:
        x = np.frombuffer(pcm, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(pcm, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:  # unsigned 8-bit
        x = (np.frombuffer(pcm, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    if sr != target_sr:
        x = _resample_linear(x, sr, target_sr)
    return x


def _resample_linear(x: np.ndarray, sr: int, target: int) -> np.ndarray:
    n_out = int(round(len(x) * target / sr))
    if n_out <= 1 or len(x) <= 1:
        return np.zeros(max(n_out, 0), np.float32)
    t = np.linspace(0.0, len(x) - 1, n_out)
    return np.interp(t, np.arange(len(x)), x).astype(np.float32)


# ------------------------------------------------------------ mel features

def _hz_to_mel_slaney(f):
    f = np.asarray(f, np.float64)
    mel = 3.0 * f / 200.0
    log_region = f >= 1000.0
    mel = np.where(
        log_region,
        15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
        mel,
    )
    return mel


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    f = 200.0 * m / 3.0
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
    return f


def mel_filter_bank(
    num_frequency_bins: int = N_FFT // 2 + 1,
    num_mel_filters: int = 128,
    min_frequency: float = 0.0,
    max_frequency: float = 8000.0,
    sampling_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Slaney-scale, slaney-normed triangular filters — HF
    audio_utils.mel_filter_bank(norm="slaney", mel_scale="slaney")."""
    fft_freqs = np.linspace(0, sampling_rate // 2, num_frequency_bins)
    mel_min = _hz_to_mel_slaney(min_frequency)
    mel_max = _hz_to_mel_slaney(max_frequency)
    mel_pts = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]  # [F, M+2]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))  # [F, M]
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    return (fb * enorm[None, :]).astype(np.float64)


def whisper_log_mel(
    waveform: np.ndarray,
    n_mels: int = 128,
    pad_to: Optional[int] = MAX_SAMPLES,
) -> np.ndarray:
    """HF WhisperFeatureExtractor numerics: periodic hann, centered
    reflect-padded power STFT, slaney mel, log10, dynamic-range clamp to
    max-8, (x+4)/4. Returns [n_mels, n_frames] float32."""
    x = np.asarray(waveform, np.float64)
    if pad_to is not None:
        if len(x) > pad_to:
            x = x[:pad_to]
        elif len(x) < pad_to:
            x = np.pad(x, (0, pad_to - len(x)))
    window = np.hanning(N_FFT + 1)[:-1]  # periodic hann
    half = N_FFT // 2
    xp = np.pad(x, (half, half), mode="reflect")
    n_frames = 1 + (len(xp) - N_FFT) // HOP
    idx = (
        np.arange(N_FFT)[None, :]
        + HOP * np.arange(n_frames)[:, None]
    )
    frames = xp[idx] * window[None, :]
    spec = np.abs(np.fft.rfft(frames, n=N_FFT, axis=1)) ** 2  # [T, F]
    spec = spec[:-1]  # whisper drops the trailing frame
    mels = mel_filter_bank(num_mel_filters=n_mels)
    mel_spec = spec @ mels  # [T-1, M]
    log_spec = np.log10(np.maximum(mel_spec, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.T.astype(np.float32)  # [M, T-1]


# -------------------------------------------------------------- processors

@dataclasses.dataclass
class ProcessedAudio:
    features: np.ndarray  # [n_mels, 3000] float32
    num_frames: int  # real (unpadded) mel frames
    num_tokens: int  # LM placeholder tokens this audio expands to
    mm_hash: int


def qwen2_audio_output_lengths(input_frames: int) -> int:
    """HF Qwen2AudioEncoder._get_feat_extract_output_lengths + avg-pool:
    conv2 (k3 s2 p1) then avg_pool1d(2, 2)."""
    L = (input_frames - 1) // 2 + 1
    return (L - 2) // 2 + 1


class Qwen2AudioProcessor:
    """Qwen2-Audio: Whisper-128-mel features, placeholder expands to the
    post-conv post-pool frame count."""

    modality = "audio"

    def __init__(self, hf_config):
        ac = getattr(hf_config, "audio_config", None)
        self.n_mels = getattr(ac, "num_mel_bins", 128) if ac else 128

    def __call__(self, audio) -> ProcessedAudio:
        x = load_audio(audio)
        feats = whisper_log_mel(x, n_mels=self.n_mels)
        num_frames = min(
            max(1, int(np.ceil(len(x) / HOP))), feats.shape[1]
        )
        h = int.from_bytes(
            hashlib.sha256(feats.tobytes()).digest()[:8], "little"
        )
        return ProcessedAudio(
            features=feats,
            num_frames=num_frames,
            num_tokens=qwen2_audio_output_lengths(num_frames),
            mm_hash=h,
        )


class WhisperASRProcessor:
    """Whisper proper (encoder-decoder ASR, models/whisper.py): mel
    features feed the encoder as per-request cross-attention context —
    no LM placeholder tokens (num_tokens=0). The tokenizer manager builds
    the decoder prompt (<|startoftranscript|>...) itself."""

    modality = "audio"
    encoder_decoder = True

    def __init__(self, hf_config):
        self.n_mels = getattr(hf_config, "num_mel_bins", 80)

    def __call__(self, audio) -> ProcessedAudio:
        x = load_audio(audio)
        feats = whisper_log_mel(x, n_mels=self.n_mels)
        h = int.from_bytes(
            hashlib.sha256(feats.tobytes()).digest()[:8], "little"
        )
        return ProcessedAudio(
            features=feats,
            num_frames=feats.shape[1],
            num_tokens=0,
            mm_hash=h,
        )
