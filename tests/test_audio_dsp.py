"""Log-mel DSP parity: the JAX matmul-DFT pipeline vs an independent
numpy/scipy replica of librosa's algorithm (librosa itself is not installed;
the replica follows librosa.feature.melspectrogram 0.8 semantics: centered
reflect-padded STFT, the symmetric hann the reference passes as a callable,
|.|^2, slaney mel filters + slaney norm)."""

import numpy as np
import pytest
import scipy.signal

from merlot_reserve_tpu.ops import audio as A


def _numpy_melspectrogram(y, sr=22050, n_fft=1536, hop=588, n_mels=64,
                          fmin=20.0, fmax=11025.0):
    window = scipy.signal.windows.hann(n_fft)  # sym=True, as the reference passes it
    pad = n_fft // 2
    ypad = np.pad(y, pad, mode="reflect")
    n_frames = 1 + (len(ypad) - n_fft) // hop
    frames = np.stack([ypad[i * hop:i * hop + n_fft] for i in range(n_frames)])
    spec = np.fft.rfft(frames * window[None, :], axis=-1)
    power = np.abs(spec) ** 2  # [T, n_bins]

    mel_w = _numpy_mel_filters(sr, n_fft, n_mels, fmin, fmax)  # [n_mels, n_bins]
    return power @ mel_w.T  # [T, n_mels]


def _numpy_mel_filters(sr, n_fft, n_mels, fmin, fmax):
    def hz_to_mel(f):
        f = np.atleast_1d(np.asarray(f, dtype=float))
        mels = f / (200.0 / 3)
        log_t = f >= 1000.0
        mels[log_t] = 15.0 + np.log(f[log_t] / 1000.0) / (np.log(6.4) / 27.0)
        return mels

    def mel_to_hz(m):
        m = np.atleast_1d(np.asarray(m, dtype=float))
        f = m * (200.0 / 3)
        log_t = m >= 15.0
        f[log_t] = 1000.0 * np.exp((np.log(6.4) / 27.0) * (m[log_t] - 15.0))
        return f

    n_bins = 1 + n_fft // 2
    fftfreqs = np.linspace(0, sr / 2, n_bins)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin)[0], hz_to_mel(fmax)[0], n_mels + 2))
    weights = np.zeros((n_mels, n_bins))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights


@pytest.fixture(scope="module")
def waveform():
    rng = np.random.RandomState(0)
    t = np.arange(110250) / 22050.0  # exactly 5 s
    y = (0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 2200 * t)
         + 0.05 * rng.randn(len(t)))
    return y.astype(np.float32)


def test_hann_matches_scipy():
    np.testing.assert_allclose(A.hann_window(1536, sym=True),
                               scipy.signal.windows.hann(1536), atol=1e-12)


def test_mel_filterbank_matches_replica():
    ours = A.mel_filterbank(22050, 1536, 64, 20.0, 11025.0)  # [n_bins, n_mels]
    ref = _numpy_mel_filters(22050, 1536, 64, 20.0, 11025.0)  # [n_mels, n_bins]
    np.testing.assert_allclose(ours, ref.T, atol=2e-7)


def test_mel_power_spectrogram_parity(waveform):
    ours = np.asarray(A.mel_power_spectrogram(waveform))
    ref = _numpy_melspectrogram(waveform)
    assert ours.shape == ref.shape == (188, 64)
    # relative tolerance: power values span ~8 orders of magnitude
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-4)


def test_make_spectrogram_shape_and_log(waveform):
    spec = np.asarray(A.make_spectrogram(waveform))
    assert spec.shape == (3, 60, 65)
    # playback-speed channel is constant 1.0
    np.testing.assert_array_equal(spec[..., 64], np.ones((3, 60)))
    # log-mel values: log(mel + .1) - log(.1) >= 0
    assert spec[..., :64].min() >= 0.0

    ref_mel = _numpy_melspectrogram(waveform)
    ref_logmel = np.log(ref_mel + 0.1) - np.log(0.1)
    # subsegment slicing: [2:62], [64:124], [126:186] of the 188 frames
    np.testing.assert_allclose(spec[0, :, :64], ref_logmel[2:62], rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(spec[1, :, :64], ref_logmel[64:124], rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(spec[2, :, :64], ref_logmel[126:186], rtol=1e-3, atol=2e-3)


def test_batch_make_spectrogram(waveform):
    batch = np.stack([waveform, waveform * 0.5])
    spec = np.asarray(A.batch_make_spectrogram(batch))
    assert spec.shape == (2, 3, 60, 65)
    single = np.asarray(A.make_spectrogram(waveform))
    np.testing.assert_allclose(spec[0], single, atol=1e-5)


def test_wrong_length_raises():
    with pytest.raises(ValueError, match="expected 188"):
        A.make_spectrogram(np.zeros(5000, np.float32))
