"""Speech Commands v2 M5 recipe (eleventh task family).

Corpus: the Google Speech Commands layout (flat class dirs +
validation_list.txt/testing_list.txt) or a plain
data_dir/{train,val}/<class>/*.wav tree — subsets/audio.py detects
either.  35 keyword classes, 1-second 16 kHz clips.

M5 (Dai et al., 2017) trains on RAW waveforms — no frontend; swap
``model="melspec_cnn"`` (+ model_kwargs backbone=...) for the log-mel
route where the STFT runs on device as one strided MXU conv.
"""

TOTAL_STEPS = 20000

config = dict(
    task="audio",
    model="m5",
    model_kwargs={},
    dataset="audio",
    data_dir=None,
    num_classes=35,
    sample_rate=16000,
    num_samples=16000,             # 1-second clips, static shape
    aug_gain=0.15,
    aug_shift=1600,                # +-100 ms circular roll
    aug_noise=0.005,
    batch_size=256,
    total_steps=TOTAL_STEPS,
    val_every=1000,
    log_every=100,
    optimizer=dict(
        name="adamw", weight_decay=1e-4,
        lr=dict(kind="cosine", lr=3e-3, total_steps=TOTAL_STEPS,
                warmup_steps=500)),
    precision="bf16",
    seed=0,
)
