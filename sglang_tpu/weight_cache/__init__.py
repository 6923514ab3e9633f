"""Weight cache daemon: load/preprocess weights once, serve many engines.

Ref behavior: srt/weight_cache/{protocol,daemon,ipc_loader}.py — a
persistent per-GPU process holds post-quantized weights in device memory
and serves CUDA IPC handles so engine restarts skip the disk->shard->
quantize pipeline.

TPU-native redesign: there is no device-memory IPC on TPU (each process
owns its chip via the runtime), and the expensive part of loading here is
the HOST pipeline — checkpoint parse, fusion-slot assembly, post_load
hooks, host-side quantization (layers/base.py host_materialize). So the
daemon pins the FINAL storage-dtype host arrays in POSIX shared memory
and serves a manifest over a Unix socket; engines map the segment
zero-copy and jax.device_put each view with their own NamedSharding
(GSPMD shards at transfer, so ONE daemon serves any tp/ep/dp engine
topology — unlike the reference's per-rank daemons). Once the transfer
completes the engine closes the mapping: no liveness dependency on the
daemon, the inverse of CUDA IPC zero-copy.
"""

from sglang_tpu.weight_cache.protocol import CacheConfig  # noqa: F401
