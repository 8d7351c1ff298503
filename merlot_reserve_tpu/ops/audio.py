"""On-device audio DSP: waveform -> log-mel spectrogram.

Replaces the reference's host-side librosa path
(/root/reference/mreserve/preprocess.py:121-156) with a JAX implementation
whose hot path is two matmuls on the MXU:

    frames[T, n_fft] @ DFT_basis[n_fft, n_bins]  (cos & sin)  -> power
    power[T, n_bins] @ mel_weights[n_bins, n_mels]            -> mel

A matmul-DFT beats an FFT here because n_fft=1536 and T=188 are tiny: the
whole 5-second segment is ~0.5 GFLOP, XLA fuses the window/square/log
elementwise chain into the GEMM epilogues, and it batches perfectly over
segments (the FFT lowering on TPU is lane-hostile at these sizes).

Exact librosa-parity choices (verified against its algorithm):
  * center=True with REFLECT padding of n_fft//2 (librosa.stft default);
  * the reference passes ``scipy.signal.windows.hann`` as a callable, which
    librosa invokes as hann(n_fft) -> a SYMMETRIC hann window (not the
    periodic fftbins variant);
  * power spectrum (|.|^2), slaney-scale mel filterbank with slaney area
    normalization (librosa.filters.mel defaults), fmin=20, fmax=11025;
  * log(mel + 0.1) - log(0.1), playback-speed appended as a 65th channel,
    [188, 65] sliced into 3 x [60, 65] subsegments with pad_size gaps
    (preprocess.py:144-155).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# host-side constant construction (numpy, cached)
# ---------------------------------------------------------------------------


def hann_window(n: int, sym: bool = True) -> np.ndarray:
    """Symmetric (sym=True, scipy default) or periodic hann window."""
    if n == 1:
        return np.ones(1)
    m = n if not sym else n - 1
    k = np.arange(n)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * k / m)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = f >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)
    return mels


def _mel_to_hz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    return np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


@lru_cache(maxsize=16)
def mel_filterbank(sr: int = 22050, n_fft: int = 1536, n_mels: int = 64,
                   fmin: float = 20.0, fmax: float = 11025.0) -> np.ndarray:
    """[n_bins, n_mels] slaney-normalized triangular mel filters
    (librosa.filters.mel semantics, htk=False, norm='slaney')."""
    n_bins = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_bins)

    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    mel_f = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (mel_f[2: n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # [n_bins, n_mels]


@lru_cache(maxsize=16)
def _dft_mel_basis(n_fft: int, sr: int, n_mels: int, fmin: float,
                   fmax: float) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Windowed DFT cos/sin bases [n_fft, n_bins] and mel weights."""
    n_bins = 1 + n_fft // 2
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    window = hann_window(n_fft, sym=True)[:, None]
    cos_b = (np.cos(ang) * window).astype(np.float32)
    sin_b = (-np.sin(ang) * window).astype(np.float32)
    mel_w = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    return cos_b, sin_b, mel_w


# ---------------------------------------------------------------------------
# device-side pipeline
# ---------------------------------------------------------------------------


def frame_signal(y, n_fft: int, hop: int):
    """Centered framing with reflect padding: [n_frames, n_fft]."""
    pad = n_fft // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return y[..., idx]


@partial(jax.jit, static_argnames=("sr", "n_fft", "hop_length", "n_mels",
                                   "fmin", "fmax"))
def mel_power_spectrogram(y, *, sr: int = 22050, n_fft: int = 1536,
                          hop_length: int = 588, n_mels: int = 64,
                          fmin: float = 20.0, fmax: float = 11025.0):
    """[..., samples] waveform -> [..., n_frames, n_mels] mel power spectrum
    (librosa.feature.melspectrogram parity)."""
    cos_b, sin_b, mel_w = _dft_mel_basis(n_fft, sr, n_mels, fmin, fmax)
    frames = frame_signal(y.astype(jnp.float32), n_fft, hop_length)
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    power = re * re + im * im
    return power @ jnp.asarray(mel_w)


def make_spectrogram(waveform, playback_speed: int = 1, sr: int = 22050,
                     pad_size: int = 2, seq_size: int = 60, n_mels: int = 64):
    """Waveform of one 5-s segment -> [3, seq_size, n_mels+1] log-mel
    subsegments, exactly the reference's make_spectrogram surface
    (preprocess.py:121-156) but jit-compiled and batchable.

    Accepts [..., samples]; returns [..., 3, seq_size, n_mels+1].
    """
    eps = 1e-1
    mel = mel_power_spectrogram(
        waveform, sr=sr, n_fft=1536 * playback_speed,
        hop_length=588 * playback_speed, n_mels=n_mels, fmin=20.0,
        fmax=sr / 2.0)
    log_mel = jnp.log(mel + eps) - np.log(eps)

    total = seq_size * 3 + pad_size * 4
    if log_mel.shape[-2] != total:
        raise ValueError(
            f"spectrogram has {log_mel.shape[-2]} frames; expected {total} "
            f"(waveform must be {total - 1} hops plus change, i.e. 5s at sr={sr})")

    speed_feat = jnp.full(log_mel.shape[:-1] + (1,), float(playback_speed),
                          dtype=log_mel.dtype)
    log_mel = jnp.concatenate([log_mel, speed_feat], -1)  # [..., T, n_mels+1]

    subs = [
        log_mel[..., pad_size:pad_size + seq_size, :],
        log_mel[..., 2 * pad_size + seq_size:2 * pad_size + 2 * seq_size, :],
        log_mel[..., 3 * pad_size + 2 * seq_size:3 * pad_size + 3 * seq_size, :],
    ]
    return jnp.stack(subs, -3)


def batch_make_spectrogram(waveforms, playback_speed: int = 1, sr: int = 22050,
                           pad_size: int = 2):
    """[B, samples] -> [B, 3, 60, 65]; one fused device program for a whole
    video's audio."""
    return make_spectrogram(waveforms, playback_speed=playback_speed, sr=sr,
                            pad_size=pad_size)


def invert_spectrogram_params(playback_speed: int = 1, sr: int = 22050):
    """Debug helper mirroring preprocess.py:158-181's parameter block."""
    return {
        "sr": sr,
        "n_mels": 64,
        "n_fft": 1536 * playback_speed,
        "hop_length": 588 * playback_speed,
        "fmin": 20.0,
        "fmax": sr / 2.0,
    }
