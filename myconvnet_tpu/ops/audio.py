"""Audio frontend ops: 1-D conv + matmul-form spectrograms, NWC.

The eleventh task family's compute substrate.  The reference framework
has no audio path (mount empty — SURVEY.md §0; its §2 inventory is
image-only), so this module sets the TPU-native convention the way the
video family set the 3-D one:

* **conv1d** — ``lax.conv_general_dilated`` over ``("NWC","WIO","NWC")``:
  the exact 1-D analogue of ``ops/conv.py``'s NHWC choice; XLA:TPU
  tiles it onto the MXU as a [W*Cin, Cout] matmul per output position
  without inserting transposes.
* **STFT as ONE strided conv** — the windowed DFT basis (cos / -sin
  rows, Hann-weighted) IS a conv filter bank ``[frame, 1, 2*bins]``,
  so framing + windowing + DFT fuse into a single MXU pass.  No
  gathers, no dynamic shapes, no `jnp.fft` (whose TPU lowering is a
  slow composite at these tiny frame sizes); the basis is a compile-
  time constant XLA folds and keeps resident.
* **mel projection as a matmul** — the triangle filterbank is a
  ``[bins, n_mels]`` constant; power-spectrogram @ mel is again MXU
  work.  The full log-mel frontend is therefore two matmuls and an
  elementwise log, all inside the jitted train step: raw int16
  waveforms are what crosses PCIe (2 bytes/sample), augmentation and
  feature extraction never touch the host.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# NWC activations, WIO kernel — 1-D twin of ops/conv.py.
DIMENSION_NUMBERS_1D = ("NWC", "WIO", "NWC")


def conv1d(x: jax.Array, w: jax.Array, *, stride: int = 1,
           padding: str = "SAME", dilation: int = 1, groups: int = 1,
           precision=None) -> jax.Array:
    """NWC conv. x: [N,T,Cin], w: [k,Cin//groups,Cout]."""
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(int(stride),),
        padding=padding,
        rhs_dilation=(int(dilation),),
        dimension_numbers=DIMENSION_NUMBERS_1D,
        feature_group_count=groups,
        precision=precision,
    )
    return out.astype(x.dtype)


def max_pool1d(x: jax.Array, window: int = 4, stride: int | None = None,
               padding: str = "VALID") -> jax.Array:
    stride = window if stride is None else stride
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else (
        jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x, neg_inf, lax.max,
        window_dimensions=(1, int(window), 1),
        window_strides=(1, int(stride), 1),
        padding=padding)


def avg_pool1d(x: jax.Array, window: int = 4, stride: int | None = None,
               padding: str = "VALID") -> jax.Array:
    stride = window if stride is None else stride
    summed = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add,
        window_dimensions=(1, int(window), 1),
        window_strides=(1, int(stride), 1),
        padding=padding)
    return (summed / float(window)).astype(x.dtype)


def global_avg_pool1d(x: jax.Array) -> jax.Array:
    return jnp.mean(x.astype(jnp.float32), axis=1).astype(x.dtype)


# ------------------------------------------------------------- frontend

def hann_window(n: int) -> np.ndarray:
    """Periodic Hann (matches np.hanning(n+1)[:-1] / torch periodic)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)) \
        .astype(np.float32)


def dft_conv_basis(n_fft: int, window: np.ndarray | None = None) \
        -> np.ndarray:
    """Windowed real-DFT basis as conv filters ``[n_fft, 1, 2*bins]``.

    Output channel 2j   = sum_t x[t] * win[t] * cos(2 pi j t / n_fft)
    Output channel 2j+1 = sum_t x[t] * win[t] * -sin(2 pi j t / n_fft)
    i.e. interleaved (Re, Im) of ``np.fft.rfft(win * frame)`` for the
    ``bins = n_fft//2 + 1`` non-negative frequencies.
    """
    if window is None:
        window = hann_window(n_fft)
    window = np.asarray(window, np.float32)
    if window.shape != (n_fft,):
        raise ValueError(f"window shape {window.shape} != ({n_fft},)")
    t = np.arange(n_fft, dtype=np.float64)
    j = np.arange(n_fft // 2 + 1, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(t, j) / n_fft        # [n_fft, bins]
    basis = np.empty((n_fft, 1, 2 * len(j)), np.float32)
    basis[:, 0, 0::2] = (np.cos(ang) * window[:, None])
    basis[:, 0, 1::2] = (-np.sin(ang) * window[:, None])
    return basis


def stft_power(x: jax.Array, n_fft: int = 400, hop: int = 160,
               window: np.ndarray | None = None,
               precision=None) -> jax.Array:
    """Power spectrogram via ONE strided MXU conv.

    x: [N, T, 1] float waveform -> [N, frames, n_fft//2 + 1] power,
    frames = floor((T - n_fft) / hop) + 1 (VALID framing, the
    torchaudio ``center=False`` convention — static shapes, no
    reflection pad).
    """
    basis = jnp.asarray(dft_conv_basis(n_fft, window), x.dtype)
    y = conv1d(x, basis, stride=hop, padding="VALID",
               precision=precision)                    # [N, F, 2*bins]
    y = y.astype(jnp.float32)
    re = y[..., 0::2]
    im = y[..., 1::2]
    return re * re + im * im


def hz_to_mel(f):
    """HTK mel scale (torchaudio default)."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def mel_filterbank(n_bins: int, n_mels: int, sample_rate: int,
                   fmin: float = 0.0, fmax: float | None = None) \
        -> np.ndarray:
    """Triangular mel filterbank ``[n_bins, n_mels]`` (HTK scale,
    unnormalized peaks = 1 — torchaudio ``norm=None`` convention).

    n_bins must be n_fft//2 + 1 of the power spectrogram it projects.
    """
    fmax = sample_rate / 2.0 if fmax is None else float(fmax)
    if not (0.0 <= fmin < fmax <= sample_rate / 2.0 + 1e-9):
        raise ValueError(f"need 0 <= fmin < fmax <= nyquist, got "
                         f"fmin={fmin}, fmax={fmax}, sr={sample_rate}")
    n_fft = 2 * (n_bins - 1)
    freqs = np.arange(n_bins, dtype=np.float64) * sample_rate / n_fft
    edges = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax),
                                  n_mels + 2))          # [n_mels + 2]
    lo, ctr, hi = edges[:-2], edges[1:-1], edges[2:]
    up = (freqs[:, None] - lo[None, :]) / np.maximum(
        ctr - lo, 1e-9)[None, :]
    down = (hi[None, :] - freqs[:, None]) / np.maximum(
        hi - ctr, 1e-9)[None, :]
    fb = np.clip(np.minimum(up, down), 0.0, 1.0)
    return fb.astype(np.float32)


def log_mel_spectrogram(x: jax.Array, *, sample_rate: int = 16000,
                        n_fft: int = 400, hop: int = 160,
                        n_mels: int = 64, fmin: float = 0.0,
                        fmax: float | None = None, eps: float = 1e-6,
                        precision=None) -> jax.Array:
    """[N, T, 1] waveform -> [N, frames, n_mels, 1] log-mel image.

    The trailing singleton channel makes the output drop straight into
    the 2-D classification zoo (spectrogram-CNN models treat time x
    mel as H x W).  Two matmuls + log, zero gathers.
    """
    p = stft_power(x, n_fft=n_fft, hop=hop, precision=precision)
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate,
                                    fmin, fmax))
    mel = jnp.einsum("nfb,bm->nfm", p, fb,
                     precision=precision)
    return jnp.log(mel + eps)[..., None]
