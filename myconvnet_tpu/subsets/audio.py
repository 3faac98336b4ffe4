"""Audio corpus reading (eleventh task family — the reference is
image-only, SURVEY.md §2; mount empty, §0).

Two real layouts plus a deterministic synthetic fallback:

* **split-dir layout**: ``data_dir/{train,val}/<class>/*.wav`` — the
  same convention every other corpus here uses.
* **Google Speech Commands layout**: flat ``data_dir/<class>/*.wav``
  with ``validation_list.txt`` / ``testing_list.txt`` at the root
  naming the held-out files (class/file.wav per line); train = the
  complement.  Detected automatically when the list files exist.

WAVs are read with the stdlib ``wave`` module (16-bit PCM, mono or
stereo-mixdown), padded/cropped to a fixed ``num_samples`` so batches
are static-shape; transfer stays int16 (2 bytes/sample — the audio
twin of the uint8 image convention), conversion to float happens on
device inside the jitted step.

``synthetic_waveforms`` labels by FREQUENCY BAND: each clip is a pure
tone from one of ``n_classes`` log-spaced bands (200 Hz – 0.45*sr)
with random phase, amplitude and additive noise — unsolvable from
time-domain amplitude statistics, so val generalization proves the
model actually resolves spectral content (the audio analogue of the
video corpus's motion labels).
"""

from __future__ import annotations

import os
import wave
from concurrent.futures import ThreadPoolExecutor

import numpy as np

DEFAULT_SAMPLE_RATE = 16000
DEFAULT_NUM_SAMPLES = 16000  # one second


def load_wav(path: str, num_samples: int,
             sample_rate: int | None = None) -> np.ndarray:
    """16-bit PCM wav -> [num_samples] int16 (pad/center-crop).

    When ``sample_rate`` is given the file's actual framerate must
    match — a mis-rated corpus (8 kHz files under a 16 kHz config)
    would otherwise train silently on time-dilated audio with the mel
    frequency axis off by the rate ratio.
    """
    with wave.open(path, "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError(
                f"{path!r}: only 16-bit PCM supported, got "
                f"{8 * f.getsampwidth()}-bit")
        if sample_rate is not None and f.getframerate() != sample_rate:
            raise ValueError(
                f"{path!r}: sample rate {f.getframerate()} != configured "
                f"{sample_rate} (resample the corpus or set sample_rate)")
        nch = f.getnchannels()
        raw = f.readframes(f.getnframes())
    x = np.frombuffer(raw, dtype="<i2")
    if nch > 1:  # mixdown
        x = x.reshape(-1, nch).mean(axis=1).astype(np.int16)
    if len(x) >= num_samples:
        start = (len(x) - num_samples) // 2
        return np.array(x[start:start + num_samples])
    out = np.zeros(num_samples, np.int16)
    out[:len(x)] = x
    return out


def _class_wavs(root: str):
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d))
                     and not d.startswith("_"))
    per_class = {c: sorted(f for f in os.listdir(os.path.join(root, c))
                           if f.lower().endswith(".wav"))
                 for c in classes}
    return classes, per_class


def read_subset(data_dir: str, split: str = "train"):
    """-> (wav_paths, labels int32, class_names sorted)."""
    split_root = os.path.join(data_dir, split)
    val_list = os.path.join(data_dir, "validation_list.txt")
    if os.path.isdir(split_root):
        root, held_out = split_root, None
    elif os.path.isfile(val_list):
        # speech-commands layout: flat tree + held-out file lists
        root = data_dir
        if split not in ("train", "val", "test"):
            raise ValueError(
                f"unknown split {split!r} for the speech-commands "
                f"layout; expected train/val/test")
        name = {"val": "validation_list.txt",
                "test": "testing_list.txt"}.get(split)
        lists = {}
        for ln in ("validation_list.txt", "testing_list.txt"):
            p = os.path.join(data_dir, ln)
            lists[ln] = set()
            if os.path.isfile(p):
                with open(p) as f:
                    lists[ln] = {line.strip() for line in f
                                 if line.strip()}
        if name is None:  # train = complement of both lists
            held_out = ("complement",
                        lists["validation_list.txt"]
                        | lists["testing_list.txt"])
        else:
            if not lists[name]:
                raise FileNotFoundError(
                    f"split {split!r} requested but {name} is missing "
                    f"or empty under {data_dir!r}")
            held_out = ("member", lists[name])
    else:
        raise FileNotFoundError(
            f"no {split!r} split dir and no validation_list.txt under "
            f"{data_dir!r}")
    classes, per_class = _class_wavs(root)
    if not classes:
        raise FileNotFoundError(f"no class dirs under {root!r}")
    paths, labels = [], []
    for ci, cname in enumerate(classes):
        for fname in per_class[cname]:
            rel = f"{cname}/{fname}"
            if held_out is not None:
                mode, names = held_out
                keep = (rel not in names) if mode == "complement" \
                    else (rel in names)
                if not keep:
                    continue
            paths.append(os.path.join(root, cname, fname))
            labels.append(ci)
    return paths, np.asarray(labels, np.int32), classes


class WavSource:
    """get_batch(idx) -> ([B, T, 1] int16, labels int32)."""

    def __init__(self, paths, labels,
                 num_samples: int = DEFAULT_NUM_SAMPLES,
                 sample_rate: int | None = DEFAULT_SAMPLE_RATE,
                 workers: int = 8):
        assert len(paths) == len(labels)
        self.paths = list(paths)
        self.labels = np.asarray(labels, np.int32)
        self.num_samples = int(num_samples)
        self.sample_rate = sample_rate
        self._pool = ThreadPoolExecutor(max_workers=workers)

    def __len__(self):
        return len(self.paths)

    def _load(self, i: int) -> np.ndarray:
        return load_wav(self.paths[i], self.num_samples,
                        self.sample_rate)

    def get_batch(self, indices):
        wavs = list(self._pool.map(self._load, indices))
        return np.stack(wavs)[..., None], self.labels[indices]


def synthetic_waveforms(n: int = 256,
                        num_samples: int = DEFAULT_NUM_SAMPLES,
                        sample_rate: int = DEFAULT_SAMPLE_RATE,
                        n_classes: int = 8, seed: int = 0):
    """Tone clips labeled by log-spaced frequency band -> int16."""
    rng = np.random.RandomState(seed)
    f_lo, f_hi = 200.0, 0.45 * sample_rate
    centers = np.geomspace(f_lo, f_hi, n_classes)
    labels = rng.randint(0, n_classes, n).astype(np.int32)
    t = np.arange(num_samples, dtype=np.float64) / sample_rate
    x = np.empty((n, num_samples), np.int16)
    for i in range(n):
        freq = centers[labels[i]] * rng.uniform(0.92, 1.08)
        amp = rng.uniform(0.15, 0.7)
        wave_f = amp * np.sin(2 * np.pi * freq * t + rng.uniform(0, 2 * np.pi))
        wave_f += rng.normal(0.0, 0.03, num_samples)
        x[i] = np.clip(wave_f, -1.0, 1.0) * 32767
    return x[..., None], labels


class ArrayWavSource:
    """In-memory waveforms (synthetic fallback / tests)."""

    def __init__(self, wavs: np.ndarray, labels: np.ndarray):
        assert len(wavs) == len(labels)
        self.wavs = wavs
        self.labels = np.asarray(labels, np.int32)

    def __len__(self):
        return len(self.wavs)

    def get_batch(self, indices):
        return self.wavs[indices], self.labels[indices]


def make_source(data_dir: str | None, split: str = "train",
                synthetic: bool = False, synthetic_n: int = 256,
                num_samples: int = DEFAULT_NUM_SAMPLES,
                sample_rate: int = DEFAULT_SAMPLE_RATE,
                n_classes: int = 8, workers: int = 8):
    if synthetic or data_dir is None:
        seed = 0 if split == "train" else 1
        src = ArrayWavSource(*synthetic_waveforms(
            synthetic_n, num_samples, sample_rate, n_classes, seed))
        src.class_names = [f"band_{i}" for i in range(n_classes)]
        return src
    paths, labels, classes = read_subset(data_dir, split)
    src = WavSource(paths, labels, num_samples=num_samples,
                    sample_rate=sample_rate, workers=workers)
    src.class_names = classes
    return src
