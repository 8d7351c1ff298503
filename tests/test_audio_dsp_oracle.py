"""Non-self-referential oracles for the log-mel DSP chain (VERDICT r1 #6).

tests/test_audio_dsp.py compares our JAX matmul-DFT pipeline against a
numpy replica written by the same author — a shared misreading of
hann/center/slaney semantics would pass silently. This module closes that:

1. The STFT/power chain (framing, centering, symmetric hann, rFFT, |.|^2)
   is checked against ``tf.signal.stft`` — an independent implementation
   (TF is in the image). tf.signal does no centering, so the reflect pad
   is applied on the input; ``tf.signal.hann_window(periodic=False)``
   matches the symmetric scipy window the reference passes to librosa
   (/root/reference/mreserve/preprocess.py:139 ``window=scipy.signal.windows.hann``).
2. The slaney mel scale is checked against the *published definition*
   (linear 200/3 Hz per mel below 1 kHz, log step ln(6.4)/27 above), via
   exact anchor values and filterbank structure properties — not a replica.
3. An end-to-end error budget: embeddings of the audio tower fed with our
   f32 on-device mel vs a float64 tf.signal-based mel must agree to a
   tolerance that provably leaves rankings over a label set unchanged
   (SURVEY §7 step 5's acceptance criterion).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from merlot_reserve_tpu.ops import audio as A


@pytest.fixture(scope="module")
def tf():
    import tensorflow as tf

    return tf


@pytest.fixture(scope="module")
def waveform():
    """5 s of structured audio: chirp + tones + noise, like real speech has
    both tonal and broadband content."""
    sr = 22050
    t = np.arange(sr * 5 + 1188) / sr  # enough samples for 188 frames
    rng = np.random.RandomState(7)
    y = (0.4 * np.sin(2 * np.pi * (200 + 40 * t) * t)
         + 0.3 * np.sin(2 * np.pi * 1700 * t)
         + 0.1 * rng.randn(len(t)))
    return y.astype(np.float32)


# ---------------------------------------------------------------------------
# 1. STFT power spectrum vs tf.signal
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_fft,hop", [(1536, 588), (3072, 1176)])
def test_stft_power_vs_tf_signal(tf, waveform, n_fft, hop):
    frames = np.asarray(A.frame_signal(jnp.asarray(waveform), n_fft, hop))
    window = A.hann_window(n_fft, sym=True)
    ours = np.abs(np.fft.rfft(frames * window[None], axis=-1)) ** 2

    # independent path: reflect-pad (tf.signal has no center=) then stft
    # with the symmetric (periodic=False) hann — scipy.signal.windows.hann
    pad = n_fft // 2
    ypad = np.pad(waveform.astype(np.float64), pad, mode="reflect")
    stft = tf.signal.stft(
        tf.constant(ypad), frame_length=n_fft, frame_step=hop,
        fft_length=n_fft,
        window_fn=lambda N, dtype: tf.signal.hann_window(
            N, periodic=False, dtype=dtype))
    theirs = np.abs(np.asarray(stft)) ** 2

    assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
    scale = np.abs(theirs).max()
    err = np.abs(ours - theirs).max() / scale
    assert err < 2e-6, f"relative STFT power error {err:.2e}"

    # and the full jitted matmul-DFT path (f32) against the same oracle
    power_matmul = np.asarray(
        A.mel_power_spectrogram.__wrapped__(
            jnp.asarray(waveform), sr=22050, n_fft=n_fft, hop_length=hop,
            n_mels=64, fmin=20.0, fmax=11025.0))
    mel_oracle = theirs @ _slaney_filterbank_from_spec(22050, n_fft)
    rel = np.abs(power_matmul - mel_oracle).max() / mel_oracle.max()
    assert rel < 5e-5, f"relative mel error (matmul-DFT f32 path) {rel:.2e}"


# ---------------------------------------------------------------------------
# 2. slaney mel scale: published-definition anchors + structure
# ---------------------------------------------------------------------------


def _slaney_filterbank_from_spec(sr, n_fft, n_mels=64, fmin=20.0,
                                 fmax=11025.0):
    """Build the filterbank from the *definition* (Slaney's Auditory Toolbox
    mel scale), used as the oracle for the mel side: f<1kHz linear at
    3/200 mel/Hz; above, mel = 15 + 27*ln(f/1000)/ln(6.4). Triangles span
    [m-1, m+1] with 'slaney' area norm 2/(hz[m+1]-hz[m-1])."""

    def hz2mel(f):
        f = np.asarray(f, dtype=np.float64)
        return np.where(f < 1000.0, f * 3.0 / 200.0,
                        15.0 + 27.0 * np.log(np.maximum(f, 1.0) / 1000.0)
                        / np.log(6.4))

    def mel2hz(m):
        m = np.asarray(m, dtype=np.float64)
        return np.where(m < 15.0, m * 200.0 / 3.0,
                        1000.0 * np.exp(np.log(6.4) * (m - 15.0) / 27.0))

    n_bins = 1 + n_fft // 2
    fftfreqs = np.linspace(0, sr / 2.0, n_bins)
    hz_pts = mel2hz(np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2))
    weights = np.zeros((n_bins, n_mels))
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fftfreqs - lo) / (ctr - lo)
        down = (hi - fftfreqs) / (hi - ctr)
        tri = np.maximum(0.0, np.minimum(up, down))
        weights[:, m] = tri * 2.0 / (hi - lo)
    return weights


def test_mel_scale_anchor_values():
    """Published anchors: 1000 Hz = 15 mel (linear/log breakpoint);
    6400 Hz = 42 mel (15 + 27, since the log step is ln(6.4)/27);
    200/3 Hz = 1 mel on the linear part."""
    assert np.isclose(A._hz_to_mel_slaney(1000.0), 15.0)
    assert np.isclose(A._hz_to_mel_slaney(6400.0), 42.0)
    assert np.isclose(A._hz_to_mel_slaney(200.0 / 3.0), 1.0)
    assert np.isclose(A._mel_to_hz_slaney(15.0), 1000.0)
    assert np.isclose(A._mel_to_hz_slaney(42.0), 6400.0)
    # exact inverses over the whole range
    f = np.linspace(0, 11025, 4001)
    assert np.allclose(A._mel_to_hz_slaney(A._hz_to_mel_slaney(f)), f,
                       atol=1e-6)


@pytest.mark.parametrize("n_fft", [1536, 3072])
def test_mel_filterbank_matches_spec(n_fft):
    ours = np.asarray(A.mel_filterbank(22050, n_fft, 64, 20.0, 11025.0),
                      dtype=np.float64)  # [n_bins, n_mels]
    spec = _slaney_filterbank_from_spec(22050, n_fft)
    assert ours.shape == spec.shape
    denom = spec.max()
    assert np.abs(ours - spec).max() / denom < 1e-5


def test_mel_filterbank_structure():
    """Structural invariants from the definition, independent of any
    implementation: triangles, unimodal columns, slaney area norm."""
    w = np.asarray(A.mel_filterbank(22050, 1536, 64, 20.0, 11025.0),
                   dtype=np.float64)
    n_bins = w.shape[0]
    fftfreqs = np.linspace(0, 11025.0, n_bins)
    for m in range(0, 64, 7):
        col = w[:, m]
        assert col.max() > 0
        peak = col.argmax()
        # unimodal: nonincreasing after the peak, nondecreasing before
        assert (np.diff(col[peak:]) <= 1e-12).all()
        assert (np.diff(col[:peak + 1]) >= -1e-12).all()
        # area normalization: integral over Hz ≈ 1 (trapezoid of a unit-area
        # triangle sampled on the fft grid; loose tol for grid effects)
        area = np.trapezoid(col, fftfreqs)
        assert 0.7 < area < 1.3, (m, area)


# ---------------------------------------------------------------------------
# 3. end-to-end error budget: rankings must be invariant to DSP error
# ---------------------------------------------------------------------------


@pytest.mark.slow  # 40s end-to-end sweep; unit oracles cover the DSP fast
def test_e2e_error_budget_preserves_ranking(tf, waveform):
    """Feed the audio tower with (a) our fused on-device f32 pipeline and
    (b) a float64 tf.signal-STFT + spec-filterbank oracle mel; CLS
    embeddings must be so close that dot-product rankings against a label
    bank are identical — the acceptance budget from SURVEY §7 step 5."""
    import jax

    from merlot_reserve_tpu.models.towers import AudioTransformer

    y = waveform[:22050 * 5]  # exactly 5 s -> 188 centered frames
    ours = np.asarray(A.make_spectrogram(jnp.asarray(y)))  # [3, 60, 65]

    # oracle mel at float64 via tf.signal
    n_fft, hop = 1536, 588
    pad = n_fft // 2
    ypad = np.pad(y.astype(np.float64), pad, mode="reflect")
    stft = tf.signal.stft(
        tf.constant(ypad), frame_length=n_fft, frame_step=hop,
        fft_length=n_fft,
        window_fn=lambda N, dtype: tf.signal.hann_window(
            N, periodic=False, dtype=dtype))
    power = np.abs(np.asarray(stft)) ** 2
    mel = power @ _slaney_filterbank_from_spec(22050, n_fft)
    log_mel = np.log(mel + 0.1) - np.log(0.1)
    log_mel = np.concatenate(
        [log_mel, np.ones_like(log_mel[:, :1])], -1)  # playback speed 1
    pad_size, seq = 2, 60
    oracle = np.stack([log_mel[pad_size:pad_size + seq],
                       log_mel[2 * pad_size + seq:2 * pad_size + 2 * seq],
                       log_mel[3 * pad_size + 2 * seq:3 * pad_size + 3 * seq]])

    mel_err = np.abs(ours - oracle).max()
    assert mel_err < 2e-3, f"log-mel e2e max-abs-err {mel_err:.2e}"

    # drive the tower with both; rankings over a 64-entry label bank
    model = AudioTransformer(hidden_size=128, num_layers=2, pooling_ratio=5,
                             size_per_head=32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(ours, jnp.float32))["params"]

    def embed(x):
        out = model.apply({"params": params}, jnp.asarray(x, jnp.float32))
        cls = np.asarray(out["cls"], np.float64)
        return cls / np.linalg.norm(cls, axis=-1, keepdims=True)

    e_ours, e_oracle = embed(ours), embed(oracle)
    cos = (e_ours * e_oracle).sum(-1)
    assert cos.min() > 1 - 1e-6, f"embedding cosine {cos.min()}"

    rng = np.random.RandomState(3)
    labels = rng.randn(64, e_ours.shape[-1])
    labels /= np.linalg.norm(labels, axis=-1, keepdims=True)
    rank_ours = (e_ours @ labels.T).argsort(-1)
    rank_oracle = (e_oracle @ labels.T).argsort(-1)
    assert np.array_equal(rank_ours, rank_oracle), "DSP error flipped a ranking"
