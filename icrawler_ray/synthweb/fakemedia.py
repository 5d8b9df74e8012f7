"""Deterministic fake media containers (video/audio) — codec-free stand-ins.

Real video/audio decode needs ffmpeg-class libraries that are not in this
container; per the build contract the CONTAINER formats are deterministic
fakes so the Ray-side plumbing (schema, batch sizing, stage signatures,
output layout) is real and oracle-checkable:

- video: ``FVID`` + uint32 n_frames + uint32 fps (no pixel payload —
  frame extraction is the codec-gated step, media.require_real_codec)
- audio: ``FAUD`` + uint32 sample_rate + uint32 n_samples + n_samples
  bytes of fake 8-bit PCM; the PCM bytes are a closed-form function of a
  seed so features computed from the REAL bytes are SQL-reproducible
"""

from __future__ import annotations

import struct

VIDEO_MAGIC = b"FVID"
AUDIO_MAGIC = b"FAUD"


def encode_video(n_frames: int, fps: int) -> bytes:
    return VIDEO_MAGIC + struct.pack("<II", n_frames, fps)


def decode_video(blob: bytes | None):
    """(n_frames, fps) or None if not a fake-video container."""
    if not blob or len(blob) < 12 or blob[:4] != VIDEO_MAGIC:
        return None
    return struct.unpack("<II", blob[4:12])


def pcm_byte(seed: int, i: int) -> int:
    """Closed-form fake PCM sample (SQL-replicable)."""
    return (seed * 7 + i * 13) % 256


def encode_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    payload = bytes(pcm_byte(seed, i) for i in range(n_samples))
    return AUDIO_MAGIC + struct.pack("<II", sample_rate, n_samples) + payload


def decode_audio(blob: bytes | None):
    """(sample_rate, payload bytes) or None."""
    if not blob or len(blob) < 12 or blob[:4] != AUDIO_MAGIC:
        return None
    sr, n = struct.unpack("<II", blob[4:12])
    payload = blob[12:12 + n]
    if len(payload) != n:
        return None
    return sr, payload
